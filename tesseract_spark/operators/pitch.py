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


def fixed_pitch_cuts(
    run: np.ndarray, pitch: float, tolerance: float = 0.15
) -> list[int]:
    """Chop positions inside ONE merged glyph run of a fixed-pitch row
    (the fpchop operator, src/textord/fpchop.cpp:72-220
    ``fixed_pitch_words`` / ``chop_blobs``): the run holds
    round(width / pitch) cells, and each cell boundary becomes a cut —
    snapped to the min-ink column inside a ±tolerance·pitch window
    around the lattice position, the reference's limited cut
    adjustment.  Unlike the concavity/seam chopper (chopper.cpp), this
    cuts even where glyphs touch with NO thin seam — the lattice, not
    the ink, decides.  Returns ascending cut x-offsets within the run
    (empty when the run is a single cell)."""
    w = run.shape[1]
    n_cells = int(round(w / pitch))
    if n_cells < 2:
        return []
    col_ink = run.sum(axis=0)
    cuts: list[int] = []
    half = max(1, int(round(tolerance * pitch)))
    for k in range(1, n_cells):
        x = int(round(k * w / n_cells))
        lo = max((cuts[-1] + 1) if cuts else 1, x - half)
        hi = min(w - 1, x + half + 1)
        if lo >= hi:
            continue
        win = col_ink[lo:hi]
        # min ink, ties broken toward the lattice position (the
        # reference prefers the pitch-true cut among equal seams)
        cand = lo + np.flatnonzero(win == win.min())
        cuts.append(int(cand[np.argmin(np.abs(cand - x))]))
    return cuts


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
