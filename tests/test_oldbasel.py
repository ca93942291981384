"""The old baseline fitter (oldbasel.cpp): partition-based robust row
baselines."""

import numpy as np
import pytest

from tesseract_spark.operators.oldbasel import (
    MAXBADRUN,
    fit_old_baseline,
    partition_line,
)


def _boxes(xs, bottoms, w=8, h=12):
    return np.array(
        [[x, b - h, x + w, b] for x, b in zip(xs, bottoms)], dtype=np.int64
    )


def test_flat_row_single_partition():
    xs = np.arange(10) * 12
    boxes = _boxes(xs, [100] * 10)
    base = fit_old_baseline(boxes)
    assert base.ok
    assert (base.partids == base.biggest).all()
    for x in (0, 50, 110):
        assert base.y(x) == pytest.approx(100, abs=0.5)


def test_descenders_form_their_own_partition():
    # every 4th glyph drops 4px below the baseline (a descender); the
    # fit must ignore them and report the descender drop statistic
    xs = np.arange(12) * 12
    bottoms = [100 + (4 if i % 4 == 3 else 0) for i in range(12)]
    boxes = _boxes(xs, bottoms)
    base = fit_old_baseline(boxes)
    assert base.ok
    desc = [i for i in range(12) if i % 4 == 3]
    for i in desc:
        assert base.partids[i] != base.biggest
    for x in (0, 70, 140):
        assert base.y(x) == pytest.approx(100, abs=0.5)
    assert base.descdrop == pytest.approx(4.0, abs=0.5)


def test_sloped_row_with_descenders():
    # gradient + descenders: the drift smoothing keeps the sloped main
    # partition together (choose_partition's drift term)
    xs = np.arange(14) * 12
    slope = 0.05
    bottoms = [100 + round(slope * x) + (4 if i in (3, 9) else 0)
               for i, x in enumerate(xs)]
    boxes = _boxes(xs, bottoms)
    base = fit_old_baseline(boxes)
    assert base.ok
    assert base.partids[3] != base.biggest
    assert base.partids[9] != base.biggest
    for x in (0, 80, 160):
        assert base.y(x) == pytest.approx(100 + slope * x, abs=1.0)


def test_curved_baseline_quadratic_fit():
    # a bowed scan line: the quadratic refit tracks the curve
    xs = np.arange(16) * 10
    curve = lambda x: 100 + 0.0008 * (x - 75) ** 2
    bottoms = [round(curve(x)) for x in xs]
    boxes = _boxes(xs, bottoms)
    base = fit_old_baseline(boxes)
    assert base.ok
    for x in (0, 75, 150):
        assert base.y(x) == pytest.approx(curve(x), abs=1.0)


def test_merge_rejoins_long_sloped_run():
    # merge_oldbl_parts (oldbasel.cpp:777-849): only a run LONGER than
    # MAXBADRUN is a candidate, and it rejoins when the run's OWN
    # fitted line extrapolates to within jumplimit of the nearest
    # main-partition blob — a sloped run descending back toward the
    # baseline (flat offset runs never pass both gates: an offset
    # beyond jumplimit keeps the line beyond jumplimit too)
    from tesseract_spark.operators.oldbasel import merge_oldbl_parts

    xs = np.arange(12) * 12
    bottoms = [100.0] * 12
    run_bottoms = {4: 105, 5: 103.5, 6: 102, 7: 100.5}
    for k, b in run_bottoms.items():
        bottoms[k] = b
    boxes = _boxes(xs, [int(round(b)) for b in bottoms])
    partids = np.zeros(12, dtype=np.int64)
    for k in run_bottoms:
        partids[k] = 1
    partsizes = np.array([8, 4], dtype=np.int64)
    merge_oldbl_parts(boxes, partids, partsizes, 0, 2.0)
    assert (partids == 0).all()
    assert partsizes.tolist() == [12, 0]


def test_short_descender_run_never_merges():
    # a 2-blob run (<= MAXBADRUN) with the SAME favorable geometry
    # must stay in its own partition — short runs are descenders
    from tesseract_spark.operators.oldbasel import merge_oldbl_parts

    xs = np.arange(12) * 12
    bottoms = [100] * 12
    bottoms[5], bottoms[6] = 102, 100
    boxes = _boxes(xs, bottoms)
    partids = np.zeros(12, dtype=np.int64)
    partids[5] = partids[6] = 1
    partsizes = np.array([10, 2], dtype=np.int64)
    merge_oldbl_parts(boxes, partids, partsizes, 0, 2.0)
    assert partids[5] == 1 and partids[6] == 1


def test_bad_run_fails_row():
    # a run of > MAXBADRUN off-baseline blobs flags the row (the
    # find_lesser_parts xheight = -1 failure)
    xs = np.arange(10) * 12
    bottoms = [100, 100, 108, 108, 108, 108, 100, 100, 100, 100]
    boxes = _boxes(xs, bottoms)
    base = fit_old_baseline(boxes, jumplimit=1.8)
    assert not base.ok
    assert MAXBADRUN == 2


def test_partition_line_backward_pass_covers_head():
    # blobs before the quiet anchor still get partition ids (the
    # backward scan of partition_line)
    xs = np.arange(8) * 12
    bottoms = [104, 100, 100, 100, 100, 100, 100, 100]
    boxes = _boxes(xs, bottoms)
    partids, partsizes, biggest = partition_line(
        boxes, lambda x: 100.0, 1.8
    )
    assert partids[0] != biggest
    assert partsizes[biggest] == 7
