"""Ports of unittest/tabvector_test.cc and unittest/colpartition_test.cc."""

from tesseract_spark.operators.tabs import TabVectorSeg, columns_overlap


def _vec(x1, y1, x2, y2):
    v = TabVectorSeg()
    v.set_startpt(x1, y1)
    v.set_endpt(x2, y2)
    return v


# ------------------------------------------------------- tabvector_test.cc


def test_set_start_end_points_match():
    v = TabVectorSeg()
    v.set_startpt(51, 65)
    assert (v.sx, v.sy) == (51, 65)
    v.set_endpt(7568, 234)
    assert (v.ex, v.ey) == (7568, 234)


def test_x_at_y_45_degree_slope_in_range_exact():
    v = _vec(0, 0, 100, 100)
    for y in range(101):
        assert v.x_at_y(y) == y


def test_x_at_y_vertical_in_range_exact():
    v = _vec(120, 0, 120, 100)
    for y in range(101):
        assert v.x_at_y(y) == 120


def test_x_at_y_horizontal():
    v = _vec(0, 76, 100, 76)
    assert v.x_at_y(76) == 0
    # rect_test-style reference quirk kept: horizontal vectors return
    # startpt.x for ANY y (tabvector_test.cc:74-77 documents this as
    # undefined-but-allowed).
    assert v.x_at_y(10) == 0


def test_x_at_y_rounding_simple():
    v = _vec(0, 0, 2, 10000)
    assert v.x_at_y(1) == 0
    assert v.x_at_y(4999) == 0
    assert v.x_at_y(5001) == 1
    assert v.x_at_y(9999) == 1


def test_x_at_y_large_numbers():
    # 800 DPI page: 8000 x 12000 px (tabvector_test.cc:92-99).
    v = _vec(7804, 504, 7968, 11768)
    assert v.x_at_y(6136) == 7886


def test_x_at_y_horizontal_in_range_exact():
    v = _vec(50, 120, 150, 120)
    assert v.x_at_y(120) == 50


def test_v_overlap_in_range_simple():
    v = _vec(0, 0, 100, 100)
    assert v.v_overlap(90, 10) == 80
    assert v.v_overlap(100, 0) == 100


def test_v_overlap_out_of_range():
    v = _vec(0, 10, 100, 90)
    assert v.v_overlap(100, 0) == 80


def test_xy_flip():
    v = _vec(1, 2, 3, 4)
    v.xy_flip()
    assert (v.sx, v.sy) == (2, 1)
    assert (v.ex, v.ey) == (4, 3)


def test_x_at_y_negative_slope_truncates_toward_zero():
    # C++ integer division truncates toward zero; a mirrored vector must
    # give the mirrored answers of XAtYRoundingSimple.
    v = _vec(0, 0, -2, 10000)
    assert v.x_at_y(4999) == 0
    assert v.x_at_y(5001) == -1


# ---------------------------------------------------- colpartition_test.cc


def test_is_in_same_column_as_reflexive():
    assert columns_overlap(1, 2, 1, 2)
    assert columns_overlap(3, 3, 3, 3)


def test_is_in_same_column_as_borders():
    a, b, c, d = (0, 1), (1, 2), (2, 3), (4, 5)
    assert columns_overlap(*a, *b) and columns_overlap(*b, *a)
    assert not columns_overlap(*c, *d) and not columns_overlap(*d, *c)
    assert not columns_overlap(*a, *d)


def test_is_in_same_column_as_superset():
    assert columns_overlap(4, 7, 2, 8)
    assert columns_overlap(2, 8, 4, 7)


def test_is_in_same_column_as_partial_overlap():
    assert columns_overlap(3, 8, 6, 10)
    assert columns_overlap(6, 10, 3, 8)
