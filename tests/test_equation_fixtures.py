"""EquationDetect geometric core — unittest/equationdetect_test.cc
fixtures ported verbatim (resolution 300, TBOX(l, b, r, t) boxes)."""

import numpy as np

from tesseract_spark.operators.equation import (
    BOTH_INDENT,
    BSTT_DIGIT,
    BSTT_MATH,
    BSTT_NONE,
    LEFT_INDENT,
    NO_INDENT,
    RIGHT_INDENT,
    check_seed_blobs_count,
    count_alignment,
    cps_super_bbox,
    estimate_type_for_unichar,
    foreground_density,
    is_indented,
    is_near_small_neighbor,
    split_cp_hor,
    split_cp_hor_lite,
)


def test_estimate_type_for_unichar():
    # equationdetect_test.cc:230-247
    assert estimate_type_for_unichar("a") == BSTT_NONE
    assert estimate_type_for_unichar("c") == BSTT_NONE
    assert estimate_type_for_unichar("'") == BSTT_NONE
    assert estimate_type_for_unichar(",") == BSTT_NONE
    assert estimate_type_for_unichar("1") == BSTT_DIGIT
    assert estimate_type_for_unichar("4") == BSTT_DIGIT
    assert estimate_type_for_unichar("|") == BSTT_DIGIT
    assert estimate_type_for_unichar("(") == BSTT_MATH
    assert estimate_type_for_unichar("+") == BSTT_MATH


def test_is_indented():
    # equationdetect_test.cc:249-298 (five-partition page)
    box1 = (0, 950, 999, 999)
    box2 = (300, 920, 900, 940)
    box3 = (0, 900, 600, 910)
    box4 = (300, 890, 600, 899)
    box5 = (300, 500, 900, 510)
    boxes = [box1, box2, box3, box4, box5]

    def others(b):
        return [x for x in boxes if x != b]

    assert is_indented(others(box1), box1) == NO_INDENT
    assert is_indented(others(box2), box2) == LEFT_INDENT
    assert is_indented(others(box3), box3) == RIGHT_INDENT
    assert is_indented(others(box4), box4) == BOTH_INDENT
    # part5 is too far from the rest
    assert is_indented(others(box5), box5) == NO_INDENT


def test_is_near_small_neighbor():
    # equationdetect_test.cc:300-327
    box1 = (0, 950, 499, 999)
    box2 = (500, 950, 999, 998)
    box3 = (0, 900, 499, 949)
    box4 = (0, 550, 499, 590)
    assert is_near_small_neighbor(box1, box2)
    assert not is_near_small_neighbor(box2, box1)
    assert is_near_small_neighbor(box1, box3)
    assert not is_near_small_neighbor(box2, box3)
    assert not is_near_small_neighbor(box3, box2)
    assert not is_near_small_neighbor(box1, box4)
    assert not is_near_small_neighbor(box2, box4)
    assert not is_near_small_neighbor(box3, box4)


def test_check_seed_blobs_count():
    # equationdetect_test.cc:329-361
    assert check_seed_blobs_count(20, 8, 0)
    assert not check_seed_blobs_count(20, 1, 8)
    assert check_seed_blobs_count(20, 3, 8)
    assert not check_seed_blobs_count(8, 0, 0)


def test_compute_foreground_density():
    # equationdetect_test.cc:363-376: top half of the image foreground
    width, height = 1024, 768
    ink = np.zeros((height, width), dtype=bool)
    ink[: height // 2, :] = True
    assert abs(foreground_density(ink, (100, 0, 140, 140)) - 0.0) < 1e-4
    assert (
        abs(
            foreground_density(
                ink, (100, height // 2 - 20, 140, height // 2 + 20)
            )
            - 0.5
        )
        < 1e-4
    )
    assert (
        abs(foreground_density(ink, (100, height - 40, 140, height)) - 1.0)
        < 1e-4
    )


def test_count_alignment():
    # equationdetect_test.cc:378-401
    vec = [1, 1, 1, 100, 200, 200]
    assert count_alignment(vec, 1) == 3
    assert count_alignment(vec, 100) == 1
    assert count_alignment(vec, 200) == 2
    assert count_alignment(vec, 3) == 3
    assert count_alignment(vec, 99) == 1
    assert count_alignment(vec, 202) == 2
    assert count_alignment(vec, 150) == 0
    assert count_alignment(vec, 50) == 0
    assert count_alignment(vec, 250) == 0


def test_compute_cps_super_bbox():
    # equationdetect_test.cc:403-447
    boxes = [(0, 0, 999, 99), (0, 100, 499, 199), (500, 100, 999, 199)]
    assert cps_super_bbox(boxes) == (0, 0, 999, 199)
    boxes.append((0, 200, 999, 299))
    assert cps_super_bbox(boxes) == (0, 0, 999, 299)
    boxes.append((0, 900, 999, 999))
    assert cps_super_bbox(boxes) == (0, 0, 999, 999)


def test_split_cp_hor_lite():
    # equationdetect_test.cc:449-481 (median width 10 -> threshold 30)
    assert split_cp_hor_lite([], 10) == []
    boxes = [(0, 0, 10, 50)]
    assert split_cp_hor_lite(boxes, 10) == [(0, 0, 10, 50)]
    boxes += [
        (11, 0, 20, 60),
        (25, 0, 30, 55),
        (100, 0, 110, 15),
        (125, 0, 140, 45),
        (500, 0, 540, 35),
    ]
    out = split_cp_hor_lite(boxes, 10)
    assert out == [(0, 0, 30, 60), (100, 0, 140, 45), (500, 0, 540, 35)]


def test_split_cp_hor():
    # equationdetect_test.cc:483-528: same break points, pieces carry
    # their blob groups
    assert split_cp_hor([], 10) == []
    boxes = [
        (0, 0, 10, 50),
        (11, 0, 20, 60),
        (25, 0, 30, 55),
        (100, 0, 110, 15),
        (125, 0, 140, 45),
        (500, 0, 540, 35),
    ]
    groups = split_cp_hor(boxes, 10)
    assert len(groups) == 3
    assert cps_super_bbox(groups[0]) == (0, 0, 30, 60)
    assert cps_super_bbox(groups[1]) == (100, 0, 140, 45)
    assert cps_super_bbox(groups[2]) == (500, 0, 540, 35)


def test_seeds2_left_indented_low_density_para():
    # the CheckForSeed seeds2 path (equationdetect.cpp:540-545): a
    # left-indented paragraph passing the LOW density threshold is an
    # equation seed even though the high-density gate rejects it
    from tesseract_spark.operators.equation import (
        is_equation_para,
        is_equation_text,
    )

    # 34 glyphs, 3 math + 3 digits: passes CheckSeedBlobsCount
    # (math > 2, math+digit > 5) at density 6/34 ~ 0.176 — above the
    # low threshold 0.1 but below the high 0.25, so seeds1 rejects it
    text = "x + y = z + 123 and some more plain words here"
    assert not is_equation_text(text)
    part = (300, 800, 700, 840)
    neighbors = [(0, 850, 999, 890), (0, 750, 999, 790)]
    assert is_equation_para(text, part, neighbors)
    # the same text flush with its neighbours stays text
    flush = (0, 800, 700, 840)
    assert not is_equation_para(text, flush, neighbors)
