"""Textline projection — the "textlineiness" evaluation map
(src/textord/textlineprojection.cpp).

The reference builds an 8-bit projection image in which every blob
increments its padded bounding box (``ConstructProjection``
textlineprojection.cpp:66-120; horizontal pad = kDefaultPadFactor x
the box height for unoriented blobs, :29-31), producing bright
horizontal bands along textlines.  Boxes are then scored by the
gradient structure of the projection at their edges: a box inside a
textline shows a strong rise entering the band from above and below
(``EvaluateBoxInternal`` :421-460: result = max(top, bottom clipped
gradients) - max(left, right clipped gradients)); a box lying between
or outside lines shows negative gradients (``BoxOutOfTextline``
:335-356).  Consumers: ImageFind's partition filter returns text-like
regions caught in a photo mask back to the text pipeline
(imagefind.cpp:1106-1180 EvaluateColPartition), and ccnontextdetect
grades noise/leader blobs.

Simplifications (documented): the projection here is full-resolution
and unrotated (fixture pages are deskewed upstream; the reference
builds it at half-res in gridded, rotated space), and the vertical
line-spacing pad of ConstructProjection:80-100 is skipped — fixture
line spacing never exceeds kMinLineSpacingFactor x scale.
"""

from __future__ import annotations

import numpy as np

K_DEFAULT_PAD_FACTOR = 2  # textlineprojection.cpp:31
K_WRONG_WAY_PENALTY = 4  # :33 (distance metric; kept for parity)
K_STRONG_TEXTLINE = 6  # BoxOutOfTextline: total >= 6 = strongly inside


def construct_projection(
    stats: np.ndarray, shape: tuple[int, int]
) -> np.ndarray:
    """ConstructProjection: every blob box, padded horizontally by
    kDefaultPadFactor/2 x height on each side, increments the
    projection (IncrementRectangle8Bit; saturating at 255).

    ``stats``: component stats rows (left, top, right, bottom, area)
    — the label_and_stats layout used across the page stage.
    Vectorized as a 2-D difference array (+1/-1 at box corners, then a
    double cumsum): O(n + H*W) regardless of component count, so a
    50k-dot halftone costs the same as a 50-glyph paragraph."""
    H, W = shape
    if len(stats) == 0:
        return np.zeros(shape, dtype=np.uint8)
    s = np.asarray(stats[:, :4], dtype=np.int64)
    l, t, r, b = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
    pad = ((b - t) * K_DEFAULT_PAD_FACTOR) // 2
    l2 = np.clip(l - pad, 0, W)
    r2 = np.clip(r + pad, 0, W)
    t2 = np.clip(t, 0, H)
    b2 = np.clip(b, 0, H)
    ok = (l2 < r2) & (t2 < b2)
    diff = np.zeros((H + 1, W + 1), dtype=np.int32)
    np.add.at(diff, (t2[ok], l2[ok]), 1)
    np.add.at(diff, (b2[ok], l2[ok]), -1)
    np.add.at(diff, (t2[ok], r2[ok]), -1)
    np.add.at(diff, (b2[ok], r2[ok]), 1)
    proj = diff.cumsum(axis=0).cumsum(axis=1)[:H, :W]
    return np.minimum(proj, 255).astype(np.uint8)


def _mean_row(proj: np.ndarray, y: int, l: int, r: int) -> float:
    """MeanPixelsInLineSegment for a horizontal segment at row y."""
    y = min(max(y, 0), proj.shape[0] - 1)
    l = max(l, 0)
    r = min(r, proj.shape[1])
    if l >= r:
        return 0.0
    return float(proj[y, l:r].mean())


def _mean_col(proj: np.ndarray, x: int, t: int, b: int) -> float:
    x = min(max(x, 0), proj.shape[1] - 1)
    t = max(t, 0)
    b = min(b, proj.shape[0])
    if t >= b:
        return 0.0
    return float(proj[t:b, x].mean())


def best_mean_gradient_row(
    proj: np.ndarray, l: int, r: int, y: int, best_is_max: bool
) -> float:
    """BestMeanGradientInRow (textlineprojection.cpp:470-492): the
    lower-minus-upper mean difference across the edge at y, best over
    the offset pairs (-2,+2), (-1,+3), (-3,+1)."""
    best = None
    for up, dn in ((-2, 2), (-1, 3), (-3, 1)):
        g = _mean_row(proj, y + dn, l, r) - _mean_row(proj, y + up, l, r)
        if best is None or (g > best) == best_is_max:
            best = g
    return best


def best_mean_gradient_col(
    proj: np.ndarray, t: int, b: int, x: int, best_is_max: bool
) -> float:
    best = None
    for lo, hi in ((-2, 2), (-1, 3), (-3, 1)):
        g = _mean_col(proj, x + hi, t, b) - _mean_col(proj, x + lo, t, b)
        if best is None or (g > best) == best_is_max:
            best = g
    return best


def evaluate_box(
    proj: np.ndarray, box: tuple[int, int, int, int]
) -> float:
    """EvaluateBoxInternal (:421-460): textlineiness of one box.
    Positive = the box sits in a horizontal textline band (rising
    projection entering from the top AND falling past the bottom edge,
    stronger than any vertical-band evidence)."""
    l, t, r, b = box
    top_grad = best_mean_gradient_row(proj, l, r, t - 1, True)
    bottom_grad = -best_mean_gradient_row(proj, l, r, b, False)
    left_grad = best_mean_gradient_col(proj, t, b, l - 1, True)
    right_grad = -best_mean_gradient_col(proj, t, b, r, False)
    return max(max(top_grad, 0.0), max(bottom_grad, 0.0)) - max(
        max(left_grad, 0.0), max(right_grad, 0.0)
    )


def box_out_of_textline(
    proj: np.ndarray, box: tuple[int, int, int, int]
) -> bool:
    """BoxOutOfTextline (:335-356): True when the box most likely does
    NOT lie within a textline — total horizontal gradient under the
    strong threshold AND at least one gradient negative."""
    l, t, r, b = box
    grad1 = best_mean_gradient_row(proj, l, r, t - 1, True)
    grad2 = -best_mean_gradient_row(proj, l, r, b, False)
    if grad1 + grad2 >= K_STRONG_TEXTLINE:
        return False  # strongly in textline
    return min(grad1, grad2) < 0


def strongly_in_textline_fraction(
    proj: np.ndarray, stats: np.ndarray, strong: float | None = None
) -> float:
    """Fraction of boxes STRONGLY inside a textline band (summed
    horizontal gradients >= the BoxOutOfTextline strong threshold) —
    the region-level vote ImageFind's partition filter takes over a
    candidate mask region's components (imagefind.cpp:1106-1180 via
    EvaluateColPartition).  Text rows produce banded projections with
    sharp top/bottom gradients at every glyph box; a halftone dot
    field floods the projection UNIFORMLY, so its dot boxes see ~zero
    gradient and never score as textline — which is exactly the
    discrimination the blob-size stats cannot make when glyphs are as
    small as dots."""
    if len(stats) == 0:
        return 0.0
    if strong is None:
        # kStrongTextline = 6 is calibrated to ~300-dpi glyph metrics
        # (pads of ~2 x a 30-px glyph height stack the projection to
        # 6-10 in a line body); scale it by the population's median
        # height so fixture-scale pages keep the same relative bar
        med_h = float(np.median(stats[:, 3] - stats[:, 1]))
        strong = max(1.0, K_STRONG_TEXTLINE * med_h / 30.0)
    n_strong = 0
    for row in stats:
        l, t, r, b = (int(v) for v in row[:4])
        grad1 = best_mean_gradient_row(proj, l, r, t - 1, True)
        grad2 = -best_mean_gradient_row(proj, l, r, b, False)
        if grad1 + grad2 >= strong:
            n_strong += 1
    return n_strong / len(stats)
