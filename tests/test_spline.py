"""Quadratic/LMS baseline fitting tests (quadlsq / detlinefit / quspline)."""

import numpy as np

from tesseract_spark.functions.spline import (
    QSpline,
    fit_baseline_spline,
    lms_line,
    quad_lsq,
)


def test_quad_lsq_exact_recovery():
    xs = np.arange(20, dtype=float)
    ys = 0.01 * xs * xs - 0.5 * xs + 3.0
    a, b, c = quad_lsq(xs, ys)
    assert abs(a - 0.01) < 1e-9 and abs(b + 0.5) < 1e-9 and abs(c - 3.0) < 1e-9


def test_quad_lsq_degenerate():
    assert quad_lsq(np.array([1.0]), np.array([5.0])) == (0.0, 0.0, 5.0)
    a, b, c = quad_lsq(np.array([0.0, 2.0]), np.array([1.0, 5.0]))
    assert a == 0.0 and abs(b - 2.0) < 1e-9 and abs(c - 1.0) < 1e-9


def test_lms_line_rejects_outliers():
    # detlinefit.cpp behavior: descender outliers must not tilt the baseline
    xs = np.arange(30, dtype=float)
    ys = 2.0 * xs + 1.0
    ys[[3, 17, 25]] += 40.0  # descender-like outliers
    m, b = lms_line(xs, ys)
    assert abs(m - 2.0) < 0.05 and abs(b - 1.0) < 1.5


def test_spline_eval_segments():
    sp = QSpline(
        xstarts=np.array([0.0, 10.0, 20.0]),
        coeffs=np.array([[0.0, 1.0, 0.0], [0.0, -1.0, 20.0]]),
    )
    assert sp.y(5.0)[0] == 5.0  # first segment: y = x
    assert sp.y(15.0)[0] == 5.0  # second: y = 20 - x


def test_fit_baseline_spline_curved():
    rng = np.random.default_rng(0)
    xs = np.linspace(0, 200, 80)
    true = 0.0005 * xs * xs + 0.01 * xs + 50.0
    ys = true + rng.normal(0, 0.2, xs.shape)
    ys[::13] += 8.0  # descender outliers
    sp = fit_baseline_spline(xs, ys, segments=2)
    pred = sp.y(xs)
    assert np.median(np.abs(pred - true)) < 1.0
