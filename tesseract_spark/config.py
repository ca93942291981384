"""Engine configuration — the reference's runtime params surface.

Mirrors the behavior-relevant subset of the ~600 named params
(src/ccutil/params.h; ``SetVariable`` src/api/baseapi.cpp:211) as a frozen
dataclass that is broadcast once per job.  Param names follow the
reference's where a direct counterpart exists.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# DPI credibility window (kMinCredibleResolution / kMaxCredibleResolution,
# src/api/baseapi.cpp:2004-2020)
MIN_CREDIBLE_DPI = 70
MAX_CREDIBLE_DPI = 2400
DEFAULT_DPI = 300

# page segmentation modes (include/tesseract/publictypes.h:157-177)
PSM_OSD_ONLY = 0
PSM_AUTO_OSD = 1
PSM_AUTO = 3
PSM_SINGLE_COLUMN = 4
PSM_SINGLE_BLOCK = 6
PSM_SINGLE_LINE = 7
PSM_SINGLE_WORD = 8
PSM_CIRCLE_WORD = 9
PSM_SPARSE_TEXT = 11
PSM_RAW_LINE = 13


def clamp_dpi(dpi: int | None) -> int:
    """Clamp a claimed resolution to the credible range
    (baseapi.cpp:2004-2020); missing/absurd values fall back to 300."""
    if dpi is None or dpi <= 0:
        return DEFAULT_DPI
    return max(MIN_CREDIBLE_DPI, min(MAX_CREDIBLE_DPI, int(dpi)))


@dataclass(frozen=True)
class EngineConfig:
    """Broadcastable job config (the params.h subset we honor)."""

    tessedit_pageseg_mode: int = PSM_AUTO
    thresholding_method: str = "otsu"  # otsu | adaptive_otsu | sauvola
    thresholding_tile_size: int = 64  # adaptive tile (thresholder.cpp:247)
    thresholding_window_size: int = 25  # sauvola window (thresholder.cpp:210)
    thresholding_kfactor: float = 0.35
    user_defined_dpi: int = 0  # 0 = honor per-row dpi, else override
    textord_max_noise_size: int = 2  # px; noise grade backstop
    language_model_penalty_non_dict_word: float = 0.15  # reserved
    user_words: tuple[str, ...] = field(default=())  # extra DAWG words

    def resolve_dpi(self, row_dpi: int | None) -> int:
        if self.user_defined_dpi:
            return clamp_dpi(self.user_defined_dpi)
        return clamp_dpi(row_dpi)
