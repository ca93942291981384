"""Ports of unittest/stats_test.cc, linlsq_test.cc and rect_test.cc.

Every expected value below is copied from the reference fixtures so the
Python STATS/LLSQ/TBOX primitives are pinned to the C++ semantics.
"""

import math

import pytest

from tesseract_spark.functions.rect import TBOX
from tesseract_spark.functions.stats import LLSQ, STATS

# ---------------------------------------------------------------- STATS
# unittest/stats_test.cc:20-66

K_TEST_DATA = [2, 0, 12, 1, 1, 2, 10, 1, 0, 0, 0, 2, 0, 4, 1, 1]


def _stats():
    s = STATS(0, 15)
    for i, n in enumerate(K_TEST_DATA):
        s.add(i, n)
    return s


def test_stats_basic():
    s = _stats()
    assert s.get_total() == 37
    assert s.mode() == 2
    assert s.pile_count(2) == 12


def test_stats_init():
    s = STATS()
    assert s.get_total() == 0
    assert s.mode() == 0
    assert s.pile_count(2) == 0


def test_stats_top_n_modes():
    s = _stats()
    modes = s.top_n_modes(3)
    assert len(modes) == 3
    # Mode0 is 12 1 1 = 14 total count with a mean of 2 3/14.
    assert modes[0][0] == pytest.approx(2.0 + 3.0 / 14, rel=1e-6)
    assert modes[0][1] == 14
    # Mode 1 is 2 10 1 = 13 total count with a mean of 5 12/13.
    assert modes[1][0] == pytest.approx(5.0 + 12.0 / 13, rel=1e-6)
    assert modes[1][1] == 13
    # Mode 2 is 4 1 1 = 6 total count with a mean of 13.5.
    assert modes[2][0] == pytest.approx(13.5, rel=1e-6)
    assert modes[2][1] == 6


# ----------------------------------------------------------------- LLSQ
# unittest/linlsq_test.cc:20-117


def expect_correct_line(llsq, m, c, rms, pearson, tol):
    assert llsq.m() == pytest.approx(m, abs=tol)
    assert llsq.c(llsq.m()) == pytest.approx(c, abs=tol)
    assert llsq.rms(llsq.m(), llsq.c(llsq.m())) == pytest.approx(rms, abs=tol)
    assert llsq.pearson() == pytest.approx(pearson, abs=tol)


def expect_correct_vector(llsq, mean_pt, vector, tol):
    mx, my = llsq.mean_point()
    vx, vy = llsq.vector_fit()
    assert mx == pytest.approx(mean_pt[0], abs=tol)
    assert my == pytest.approx(mean_pt[1], abs=tol)
    assert vx == pytest.approx(vector[0], abs=tol)
    assert vy == pytest.approx(vector[1], abs=tol)


def test_llsq_basic_lines():
    llsq = LLSQ()
    llsq.add(1.0, 1.0)
    llsq.add(2.0, 2.0)
    expect_correct_line(llsq, 1.0, 0.0, 0.0, 1.0, 1e-6)
    half_root_2 = math.sqrt(2.0) / 2.0
    expect_correct_vector(llsq, (1.5, 1.5), (half_root_2, half_root_2), 1e-6)
    llsq.remove(2.0, 2.0)
    llsq.add(1.0, 2.0)
    llsq.add(10.0, 1.0)
    llsq.add(-8.0, 1.0)
    # The point at 1,2 pulls the result away from what would otherwise be
    # a perfect fit to a horizontal line by 0.25 unit, rms error 0.433.
    expect_correct_line(llsq, 0.0, 1.25, 0.433, 0.0, 1e-2)
    expect_correct_vector(llsq, (1.0, 1.25), (1.0, 0.0), 1e-3)
    llsq.add(1.0, 2.0, 10.0)
    # With a heavy weight, the point at 1,2 pulls the line nearer.
    expect_correct_line(llsq, 0.0, 1.786, 0.41, 0.0, 1e-2)
    expect_correct_vector(llsq, (1.0, 1.786), (1.0, 0.0), 1e-3)


def test_llsq_vectors():
    llsq = LLSQ()
    llsq.add(1.0, 1.0)
    llsq.add(1.0, -1.0)
    expect_correct_vector(llsq, (1.0, 0.0), (0.0, 1.0), 1e-6)
    llsq.add(0.9, -2.0)
    llsq.add(1.1, -3.0)
    llsq.add(0.9, 2.0)
    llsq.add(1.10001, 3.0)
    expect_correct_vector(llsq, (1.0, 0.0), (0.0, 1.0), 1e-3)


def test_llsq_rms_orth_works_as_intended():
    # linlsq_test.cc:101-114: rms_orth(orth) must equal
    # sqrt(sum((nvec . (p - mean))^2) / n) with nvec = normalised !orth.
    pts = [(0.56, 0.95), (0.09, 0.09), (0.13, 0.77), (0.16, 0.83), (0.45, 0.79)]
    for orth in [(1.0, 0.0), (1.0, 1.0), (1.0, 2.0), (2.0, 1.0)]:
        llsq = LLSQ()
        n = len(pts)
        ax = sum(p[0] for p in pts) / n
        ay = sum(p[1] for p in pts) / n
        nx, ny = -orth[1], orth[0]
        norm = math.hypot(nx, ny)
        nx, ny = nx / norm, ny / norm
        expected = 0.0
        for p in pts:
            llsq.add(p[0], p[1])
            dot = nx * (p[0] - ax) + ny * (p[1] - ay)
            expected += dot * dot
        expected = math.sqrt(expected / n)
        assert llsq.rms_orth(orth[0], orth[1]) == pytest.approx(expected, abs=1e-4)


# ----------------------------------------------------------------- TBOX
# unittest/rect_test.cc:27-170


def test_tbox_overlap_inside():
    a = TBOX(10, 10, 20, 20)
    b = TBOX(11, 11, 12, 12)
    assert a.overlap(b) and b.overlap(a)
    assert a.overlap_fraction(b) == pytest.approx(0.01)
    assert b.overlap_fraction(a) == pytest.approx(1.0)


def test_tbox_overlap_bool_corners_and_sides():
    mid = TBOX(10, 10, 30, 30)
    for other in [TBOX(5, 5, 15, 15), TBOX(5, 25, 15, 35),
                  TBOX(5, 15, 15, 25), TBOX(15, 5, 25, 15)]:
        assert mid.overlap(other) and other.overlap(mid)


def test_tbox_overlap_fraction_corners():
    mid = TBOX(10, 10, 30, 30)
    bottom_left = TBOX(5, 5, 15, 15)
    top_left = TBOX(5, 25, 15, 35)
    assert mid.overlap_fraction(bottom_left) == pytest.approx((5.0 * 5.0) / (20.0 * 20.0))
    assert bottom_left.overlap_fraction(mid) == pytest.approx((5.0 * 5.0) / (10.0 * 10.0))
    assert mid.overlap_fraction(top_left) == pytest.approx((5.0 * 5.0) / (20.0 * 20.0))
    assert top_left.overlap_fraction(mid) == pytest.approx((5.0 * 5.0) / (10.0 * 10.0))


def test_tbox_overlap_fraction_sides():
    mid = TBOX(10, 10, 30, 30)
    left = TBOX(5, 15, 15, 25)
    bottom = TBOX(15, 5, 25, 15)
    assert mid.overlap_fraction(left) == pytest.approx((5.0 * 10.0) / (20.0 * 20.0))
    assert left.overlap_fraction(mid) == pytest.approx((5.0 * 10.0) / (10.0 * 10.0))
    assert mid.overlap_fraction(bottom) == pytest.approx((5.0 * 10.0) / (20.0 * 20.0))
    assert bottom.overlap_fraction(mid) == pytest.approx((5.0 * 10.0) / (10.0 * 10.0))


def test_tbox_overlap_span():
    mid = TBOX(10, 10, 30, 30)
    vertical = TBOX(15, 5, 25, 35)
    horizontal = TBOX(5, 15, 35, 25)
    assert mid.overlap(vertical) and vertical.overlap(mid)
    assert mid.overlap(horizontal) and horizontal.overlap(mid)
    assert mid.overlap_fraction(vertical) == pytest.approx((10.0 * 20.0) / (20.0 * 20.0))
    assert vertical.overlap_fraction(mid) == pytest.approx((10.0 * 20.0) / (10.0 * 30.0))
    assert mid.overlap_fraction(horizontal) == pytest.approx((20.0 * 10.0) / (20.0 * 20.0))
    assert horizontal.overlap_fraction(mid) == pytest.approx((20.0 * 10.0) / (30.0 * 10.0))


def test_tbox_overlap_outside():
    mid = TBOX(10, 10, 30, 30)
    left = TBOX(0, 15, 5, 25)
    assert not mid.overlap(left) and not left.overlap(mid)
    assert mid.overlap_fraction(left) == 0.0
    assert left.overlap_fraction(mid) == 0.0


def test_tbox_x_overlap_fraction():
    a = TBOX(10, 10, 20, 20)
    b = TBOX(12, 100, 26, 200)
    c = TBOX(0, 0, 100, 100)
    d = TBOX(0, 0, 1, 1)
    assert a.x_overlap_fraction(b) == pytest.approx(8.0 / 10.0)
    assert b.x_overlap_fraction(a) == pytest.approx(8.0 / 14.0)
    assert a.x_overlap_fraction(c) == pytest.approx(1.0)
    assert c.x_overlap_fraction(a) == pytest.approx(10.0 / 100.0)
    assert a.x_overlap_fraction(d) == 0.0
    assert d.x_overlap_fraction(a) == 0.0


def test_tbox_y_overlap_fraction():
    a = TBOX(10, 10, 20, 20)
    b = TBOX(100, 12, 200, 26)
    c = TBOX(0, 0, 100, 100)
    d = TBOX(0, 0, 1, 1)
    assert a.y_overlap_fraction(b) == pytest.approx(8.0 / 10.0)
    assert b.y_overlap_fraction(a) == pytest.approx(8.0 / 14.0)
    assert a.y_overlap_fraction(c) == pytest.approx(1.0)
    assert c.y_overlap_fraction(a) == pytest.approx(10.0 / 100.0)
    assert a.y_overlap_fraction(d) == 0.0
    assert d.y_overlap_fraction(a) == 0.0


def test_tbox_overlap_fraction_zero_size():
    # rect_test.cc:146-168: a zero-size box placed inside a larger box
    # counts as fully covered on that axis; a box cannot cover a
    # zero-size box.
    zero = TBOX(10, 10, 10, 10)
    big = TBOX(0, 0, 100, 100)
    small = TBOX(0, 0, 1, 1)
    assert zero.x_overlap_fraction(big) == 1.0
    assert big.x_overlap_fraction(zero) == 0.0
    assert zero.x_overlap_fraction(small) == 0.0
    assert small.x_overlap_fraction(zero) == 0.0
    assert zero.y_overlap_fraction(big) == 1.0
    assert big.y_overlap_fraction(zero) == 0.0
    assert zero.y_overlap_fraction(small) == 0.0
    assert small.y_overlap_fraction(zero) == 0.0
