"""Diacritic reattachment — noise blobs rejoin overlapping word boxes.

Re-expresses ``Tesseract::ReassignDiacritics`` /
``AssignDiacriticsToOverlappingBlobs`` (src/ccmain/control.cpp:918-1124):
small marks that the noise filter stripped (accents, i-dots) are matched
back to the word whose box they overlap horizontally and sit closest to
vertically.  The candidate search is the reference's BBGrid neighbour scan
(src/textord/bbgrid.h) expressed as a grid-bucket join; at DataFrame scale
the same keys drive an equi-join (queries.q_grid_join), while inside the
page UDF it is a vectorized interval test.
"""

from __future__ import annotations

import numpy as np


def assign_diacritics(
    noise_boxes: np.ndarray, word_boxes: np.ndarray, max_gap: int = 6
) -> np.ndarray:
    """Match noise blobs to word boxes.

    noise_boxes: [N, 4] (l, t, r, b); word_boxes: [W, 4].
    Returns [N] word index (or -1).  A noise blob attaches to the word with
    which it overlaps horizontally and whose vertical band it is within
    ``max_gap`` px of; ties resolve to the vertically closest word, then
    the lowest word index (the reference's greedy better-than tie-break).
    """
    n, w = len(noise_boxes), len(word_boxes)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0 or w == 0:
        return out
    nb = noise_boxes[:, None, :]  # [N, 1, 4]
    wb = word_boxes[None, :, :]  # [1, W, 4]
    h_overlap = np.minimum(nb[..., 2], wb[..., 2]) > np.maximum(
        nb[..., 0], wb[..., 0]
    )
    # vertical distance between bands (0 when overlapping)
    v_gap = np.maximum(
        np.maximum(wb[..., 1] - nb[..., 3], nb[..., 1] - wb[..., 3]), 0
    )
    ok = h_overlap & (v_gap <= max_gap)
    cost = np.where(ok, v_gap, np.iinfo(np.int32).max)
    best = cost.argmin(axis=1)
    out = np.where(ok[np.arange(n), best], best, -1)
    return out
