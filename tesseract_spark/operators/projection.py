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


def vertical_distance(proj: np.ndarray, x: int, y1: int, y2: int) -> int:
    """VerticalDistance (textlineprojection.cpp:248-278): walk the
    projection column from y1 to y2; a DECREASE in textline density
    (stepping out of a line band) costs kWrongWayPenalty, staying flat
    costs 1, an increase costs 1/kWrongWayPenalty (integer math, so 0
    at this module's scale_factor of 1)."""
    H, W = proj.shape
    x = min(max(x, 0), W - 1)
    if y1 == y2:
        return 0
    step = 1 if y1 < y2 else -1
    prev = int(proj[min(max(y1, 0), H - 1), x])
    distance = 0
    right_way = 0
    y = y1
    while y != y2:
        y += step
        pixel = int(proj[min(max(y, 0), H - 1), x])
        if pixel < prev:
            distance += K_WRONG_WAY_PENALTY
        elif pixel > prev:
            right_way += 1
        else:
            distance += 1
        prev = pixel
    return distance + right_way // K_WRONG_WAY_PENALTY


def horizontal_distance(proj: np.ndarray, x1: int, x2: int, y: int) -> int:
    """HorizontalDistance (:280-306) — the x-axis twin."""
    H, W = proj.shape
    y = min(max(y, 0), H - 1)
    if x1 == x2:
        return 0
    step = 1 if x1 < x2 else -1
    prev = int(proj[y, min(max(x1, 0), W - 1)])
    distance = 0
    right_way = 0
    x = x1
    while x != x2:
        x += step
        pixel = int(proj[y, min(max(x, 0), W - 1)])
        if pixel < prev:
            distance += K_WRONG_WAY_PENALTY
        elif pixel > prev:
            right_way += 1
        else:
            distance += 1
        prev = pixel
    return distance + right_way // K_WRONG_WAY_PENALTY


K_PARA_PERP_DIST_RATIO = 4  # textlineprojection.cpp:39


def distance_of_box_from_box(
    proj: np.ndarray,
    from_box: tuple[int, int, int, int],
    to_box: tuple[int, int, int, int],
    horizontal_textline: bool = True,
) -> int:
    """DistanceOfBoxFromBox (:198-246): textline-aware distance used to
    assign diacritics/partitions to their nearest line.  Perpendicular
    travel through falling projection (leaving a line band) dominates;
    parallel gap is discounted by kParaPerpDistRatio.  Boxes are
    (l, t, r, b) in TOP-DOWN full-resolution coords (this module's
    documented simplification: scale 1, no denorm)."""
    fl, ft, fr, fb = from_box
    tl, tt, tr, tb = to_box
    if horizontal_textline:
        # x_gap (rect.h:238) + box width; negative gap = overlap.
        parallel_gap = max(fl, tl) - min(fr, tr) + (fr - fl)
        x = (fl + fr) // 2
        # Does from_box stick out further above (top-down: smaller t)
        # than below?  Start at the overhanging edge, end at the
        # to_box edge clipped to not cross the start.
        if tt - ft >= fb - tb:
            y1 = ft
            y2 = max(tt, y1)
        else:
            y1 = fb
            y2 = min(tb, y1)
        perpendicular_gap = vertical_distance(proj, x, y1, y2)
    else:
        parallel_gap = max(ft, tt) - min(fb, tb) + (fb - ft)
        if tr - fr <= fl - tl:
            x1 = fr
            x2 = min(tr, x1)
        else:
            x1 = fl
            x2 = max(tl, x1)
        y = (ft + fb) // 2
        perpendicular_gap = horizontal_distance(proj, x1, x2, y)
    return perpendicular_gap + parallel_gap // K_PARA_PERP_DIST_RATIO


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
