"""Quadratic baseline fitting — QSPLINE / QLSQ analogues.

Re-expresses ``src/ccstruct/quadlsq.cpp`` (quadratic least squares) and
``src/ccstruct/quspline.h`` (piecewise-quadratic baseline ``QSPLINE::y(x)``,
stored as segment boundaries + per-segment coefficients; consumed by
ROW baselines, src/ccstruct/ocrrow.h:39) plus the least-median-of-squares
trimming of ``src/ccstruct/detlinefit.cpp`` (``DetLineFit::Fit``): fit with
all points, drop the half with largest residuals, refit — robust to
ascender/descender outliers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def quad_lsq(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float, float]:
    """Least-squares quadratic y = a*x^2 + b*x + c (quadlsq.cpp);
    degrades to a line / constant when underdetermined."""
    if len(xs) == 0:
        return 0.0, 0.0, 0.0
    if len(xs) == 1:
        return 0.0, 0.0, float(ys[0])
    if len(xs) == 2:
        m, b = np.polyfit(xs.astype(np.float64), ys.astype(np.float64), 1)
        return 0.0, float(m), float(b)
    a, b, c = np.polyfit(xs.astype(np.float64), ys.astype(np.float64), 2)
    return float(a), float(b), float(c)


def lms_line(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float]:
    """Least-median-of-squares-ish line fit (detlinefit.cpp): LSQ fit,
    trim the worst half of residuals, refit.  Returns (slope, intercept)."""
    xs = xs.astype(np.float64)
    ys = ys.astype(np.float64)
    if len(xs) < 2:
        return 0.0, float(ys[0]) if len(ys) else 0.0
    m, b = np.polyfit(xs, ys, 1)
    if len(xs) >= 6:
        resid = np.abs(ys - (m * xs + b))
        keep = resid <= np.median(resid)
        if keep.sum() >= 2:
            m, b = np.polyfit(xs[keep], ys[keep], 1)
    return float(m), float(b)


@dataclass
class QSpline:
    """Piecewise quadratic baseline: xstarts[i] <= x < xstarts[i+1] uses
    coeffs[i] = (a, b, c) — the QSPLINE storage layout (arrays of segment
    boundaries + coefficients, SURVEY §1.1 ROW mapping)."""

    xstarts: np.ndarray  # [k+1]
    coeffs: np.ndarray  # [k, 3]

    def y(self, x: np.ndarray | float) -> np.ndarray:
        x = np.atleast_1d(np.asarray(x, dtype=np.float64))
        seg = np.clip(
            np.searchsorted(self.xstarts, x, side="right") - 1,
            0,
            len(self.coeffs) - 1,
        )
        a, b, c = (self.coeffs[seg, i] for i in range(3))
        return a * x * x + b * x + c


def fit_baseline_spline(
    xs: np.ndarray, ys: np.ndarray, segments: int = 2
) -> QSpline:
    """Fit a piecewise-quadratic baseline to blob-bottom points.

    Points are split into equal-count x-segments; each segment gets an
    LMS-trimmed quadratic; segment boundaries come from the x quantiles
    (the reference seeds QSPLINE segments from block partitions,
    baselinedetect.cpp).
    """
    order = np.argsort(xs, kind="stable")
    xs, ys = xs[order].astype(np.float64), ys[order].astype(np.float64)
    n = len(xs)
    segments = max(1, min(segments, n // 3 or 1))
    bounds = [xs[0]] + [
        xs[min(n - 1, (i * n) // segments)] for i in range(1, segments)
    ] + [xs[-1] + 1.0]
    coeffs = np.zeros((segments, 3), dtype=np.float64)
    for i in range(segments):
        lo, hi = bounds[i], bounds[i + 1]
        sel = (xs >= lo) & (xs < hi)
        if sel.sum() < 3:
            m, b = lms_line(xs[sel], ys[sel]) if sel.sum() else (0.0, 0.0)
            coeffs[i] = (0.0, m, b)
        else:
            # trim worst residuals against a line first, then quad fit
            m, b = lms_line(xs[sel], ys[sel])
            resid = np.abs(ys[sel] - (m * xs[sel] + b))
            keep = resid <= max(np.median(resid), 1.0)
            sx, sy = xs[sel][keep], ys[sel][keep]
            coeffs[i] = quad_lsq(sx, sy) if len(sx) >= 3 else (0.0, m, b)
    return QSpline(np.asarray(bounds[:-1] + [bounds[-1]]), coeffs)
