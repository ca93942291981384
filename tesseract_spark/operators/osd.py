"""Orientation detection (OSD) — which of the four rotations is upright.

Re-expresses ``os_detect`` / ``OrientationDetector``
(src/ccmain/osdetect.cpp:213-440): the reference classifies individual
blobs at each of the four orientations and sums per-orientation scores;
here the per-blob classifier is the template bank, and the vote is the
summed best match fraction over candidate glyph starts at each rotation —
the same argmax-of-summed-scores aggregate (queries.q_osd_vote is the
DataFrame-level analogue of the vote).
"""

from __future__ import annotations

import numpy as np

from ..functions.image_ops import binarize_otsu
from ..lstm.templates import get_net
from .page import analyze_page


def orientation_scores(gray: np.ndarray) -> dict[int, float]:
    """Score each rotation (degrees clockwise needed to make the page
    upright): sum of best template match fractions over the rows the
    layout stage finds at that rotation, weighted by glyph count."""
    net = get_net()
    scores: dict[int, float] = {}
    img = gray
    for rot in (0, 90, 180, 270):
        score = 0.0
        layout = analyze_page(img)
        for region in layout.regions:
            if region.kind != "text":
                continue
            for row in region.rows:
                cand_xs, fracs = net.match_scores(row.strip)
                if len(cand_xs) == 0:
                    continue
                best = np.zeros(len(cand_xs), dtype=np.float32)
                for w in fracs:
                    if fracs[w].size:
                        best = np.maximum(best, fracs[w].max(axis=0))
                score += float(best.sum())
        scores[rot] = round(score, 4)
        img = np.rot90(img, k=-1)  # next candidate rotation
    return scores


def detect_orientation(gray: np.ndarray) -> tuple[int, dict[int, float]]:
    """(rotation_to_upright_degrees, per-rotation scores)."""
    scores = orientation_scores(gray)
    best = max(sorted(scores), key=lambda r: scores[r])
    return best, scores
