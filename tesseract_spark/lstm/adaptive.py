"""Per-document adaptive glyph templates — the adaptive-classifier analogue.

The reference's legacy engine learns within a document: words that are
unambiguous dictionary matches become training samples, each character
blob is added as a temporary template (LearnWord / AdaptToChar,
src/classify/adaptmatch.cpp:262-440), and later low-rated blobs are
re-classified against the adapted templates (AdaptiveClassifier,
adaptmatch.cpp:202-234).  Adaptability gate: bounded word length
(MAX_ADAPTABLE_WERD_SIZE = 40, adaptmatch.cpp:85), dictionary-accepted
best choice with all alternatives clearly worse (AdaptableWord,
adaptmatch.cpp:811-829; the mode-flag variant ``word_adaptable`` in
src/ccmain/adaptions.cpp:32-118 gates on the same acceptable/
one-dict-choice predicates — tessedit_tess_adaption_mode's default
mask 0x27 enables them all, which is the behavior here).

Here the unit is the canonical 16-row glyph bitmap: pass 1 decodes a page
and harvests bitmaps from adaptable words; pass 2 re-decodes rows whose
static template match dropped ink, scoring dropped candidate columns
against the adapted bitmaps with a tolerance threshold (the analogue of
matcher_good_threshold = 0.125 rating distance, classify.cpp:86 — here a
minimum equal-pixel fraction).  State lives inside one pandas-UDF call —
nothing shuffles.  Lifetime: per page by default; with the pipeline's
``adapt_carryover`` option one AdaptiveTemplates instance spans all pages
of a document (SwitchAdaptiveClassifier continuity) and templates are
capped at K_MAX_ADAPTED_PROTOS, the analogue of the reference's bounded
adapted-config count (MAX_NUM_CONFIGS), so matching cost stays bounded
over long documents.
"""

from __future__ import annotations

import numpy as np

MAX_ADAPTABLE_WERD_SIZE = 40  # adaptmatch.cpp:85
K_ADAPT_MATCH_FRAC = 0.875  # min equal-pixel fraction vs an adapted bitmap
#   (1 - matcher_good_threshold-style tolerance; static exact gate is 0.9
#    of glyph pixels, adapted templates tolerate slightly more damage)
K_ADAPTABLE_MIN_CONF = 20.0  # floor confidence for harvesting: a word
#   recovered through a soft (dict-arbitrated) event carries the low soft
#   probability on the damaged char by construction, so the real gate is
#   dictionary acceptance + the kDictRatio flip margin (AdaptableWord's
#   adjust-factor check); this floor only rejects junk
K_SUFFICIENT_EXAMPLES = 1  # bitmaps usable immediately within the page
#   (temp configs are live before becoming permanent, adaptmatch.cpp:2143)
K_MAX_ADAPTED_PROTOS = 64  # total template cap (MAX_NUM_CONFIGS role):
#   bounds per-column match cost on long carryover documents


class AdaptiveTemplates:
    """Mutable per-page template store keyed by character code."""

    def __init__(self) -> None:
        # code -> list of bool [16, w] bitmaps (deduped)
        self.protos: dict[int, list[np.ndarray]] = {}
        self.n_learned = 0

    def learn(self, code: int, bitmap: np.ndarray) -> None:
        """AdaptToChar: add one glyph bitmap as a temporary template."""
        if not bitmap.any() or self.n_learned >= K_MAX_ADAPTED_PROTOS:
            return
        got = self.protos.setdefault(code, [])
        for p in got:
            if p.shape == bitmap.shape and (p == bitmap).all():
                return  # NumTimesSeen++ in the reference; dedup here
        got.append(bitmap.astype(bool))
        self.n_learned += 1

    def match(
        self, strip: np.ndarray, x: int
    ) -> tuple[int, float, int] | None:
        """Best adapted-template match at column x.

        Returns (code, equal-pixel fraction, width) or None if nothing
        clears K_ADAPT_MATCH_FRAC.  Mirrors AdaptiveClassifier's match of
        a blob against every adapted class.
        """
        H, W = strip.shape
        best: tuple[int, float, int] | None = None
        for code, bitmaps in self.protos.items():
            for p in bitmaps:
                w = p.shape[1]
                if x + w > W:
                    window = np.zeros((H, w), dtype=bool)
                    window[:, : W - x] = strip[:, x:]
                else:
                    window = strip[:, x : x + w]
                frac = float((window == p).mean())
                if frac >= K_ADAPT_MATCH_FRAC and (
                    best is None or frac > best[1]
                ):
                    best = (code, frac, w)
        return best


def harvest_word(
    adapted: AdaptiveTemplates,
    strip: np.ndarray,
    chars: list[tuple[int, int]],
    widths: np.ndarray,
) -> None:
    """LearnWord: store each character's observed bitmap.

    ``chars``: [(code, start_column)] for one adaptable word;
    ``widths``: canonical glyph width per code (width_by_code).
    """
    H, W = strip.shape
    for code, x in chars:
        if code >= len(widths):
            continue  # space/blank never adapts
        w = int(widths[code])
        if x + w <= W:
            adapted.learn(code, strip[:, x : x + w].copy())
