"""Fixed-pitch detection + pitch estimation.

Re-expresses ``compute_fixed_pitch`` / ``compute_block_pitch``
(src/textord/topitch.cpp:75-300) on numpy: a block is fixed-pitch when
blob-center advances are consistent with one lattice spacing.  The
reference decides via projection/pitch synchronization; here the decision
statistic is the concentration of center advances around their mode plus a
lattice-residual check — SURVEY §2.4 notes matching word-break *results*,
not internals, is the contract.  CJK variant (cjkpitch.cpp) shares this
path with a different tolerance.
"""

from __future__ import annotations

import numpy as np


def detect_pitch(
    centers: np.ndarray, tolerance: float = 0.15, min_fraction: float = 0.8
) -> tuple[bool, float]:
    """(is_fixed_pitch, pitch_px) for one row/block of blob x-centers.

    Fixed-pitch when >= min_fraction of advances sit within ``tolerance``
    of the modal advance AND centers snap to the implied lattice.
    """
    centers = np.sort(np.asarray(centers, dtype=np.float64))
    if len(centers) < 4:
        return False, 0.0
    adv = np.diff(centers)
    med = float(np.median(adv))
    if med <= 0:
        return False, 0.0
    near = np.abs(adv - med) <= max(1.0, tolerance * med)
    if near.mean() < min_fraction:
        return False, 0.0
    pitch = float(adv[near].mean())
    # lattice residual: centers modulo pitch should concentrate
    phases = (centers - centers[0]) % pitch
    phases = np.minimum(phases, pitch - phases)
    if float(np.median(phases)) > max(1.0, tolerance * pitch):
        return False, 0.0
    return True, pitch


def segment_fixed_pitch_words(
    centers: np.ndarray, pitch: float, gap_cells: int = 1
) -> list[list[int]]:
    """Chop a fixed-pitch row into words: a gap of more than ``gap_cells``
    empty lattice cells separates words (the fixed-pitch chopper's word
    rule, topitch/wordseg)."""
    order = np.argsort(centers, kind="stable")
    sorted_c = np.asarray(centers, dtype=np.float64)[order]
    words: list[list[int]] = [[int(order[0])]]
    for prev, idx in zip(range(len(order) - 1), order[1:]):
        gap = sorted_c[prev + 1] - sorted_c[prev]
        if gap > (gap_cells + 0.5) * pitch:
            words.append([])
        words[-1].append(int(idx))
    return words
