"""Port of unittest/tablefind_test.cc over the tablefind scalar
predicates (gap_in_x_projection / has_leader_adjacent /
split_fragmented_partition).  Boxes are (l, bottom, r, top) bottom-up
exactly as the reference fixtures write them."""

from tesseract_spark.operators.tables import (
    gap_in_x_projection,
    has_leader_adjacent,
    split_fragmented_partition,
)

MEDIAN_XHEIGHT = 5  # finder_->set_global_median_xheight(5)


def test_gap_in_x_projection_no_gap():
    assert not gap_in_x_projection([10] * 100, MEDIAN_XHEIGHT)


def test_gap_in_x_projection_edge_gap():
    data = [2] * 10 + [10] * 80 + [2] * 10
    # low shoulders at the EDGES are not a gap between two runs
    assert not gap_in_x_projection(data, MEDIAN_XHEIGHT)


def test_gap_in_x_projection_exists():
    data = [10] * 10 + [2] * 80 + [10] * 10
    assert gap_in_x_projection(data, MEDIAN_XHEIGHT)


def test_has_leader_adjacent_overlapping():
    leaders = [((90, 0, 150, 5), 0, 0)]
    assert has_leader_adjacent((0, 0, 100, 10), (0, 0), leaders, MEDIAN_XHEIGHT)
    assert not has_leader_adjacent((0, 25, 100, 40), (0, 0), leaders,
                                   MEDIAN_XHEIGHT)
    assert has_leader_adjacent((145, 0, 200, 20), (0, 0), leaders,
                               MEDIAN_XHEIGHT)
    assert has_leader_adjacent((40, 0, 50, 4), (0, 0), leaders, MEDIAN_XHEIGHT)


def test_has_leader_adjacent_no_overlap():
    leaders = [((90, 10, 150, 15), 0, 0)]
    assert has_leader_adjacent((0, 10, 85, 20), (0, 0), leaders,
                               MEDIAN_XHEIGHT)
    assert not has_leader_adjacent((0, 25, 100, 40), (0, 0), leaders,
                                   MEDIAN_XHEIGHT)
    # zero vertical core overlap: not adjacent
    assert not has_leader_adjacent((0, 0, 100, 10), (0, 0), leaders,
                                   MEDIAN_XHEIGHT)


def test_has_leader_adjacent_preserves_columns():
    leaders = [((90, 0, 150, 5), 1, 2)]
    assert not has_leader_adjacent((0, 0, 85, 10), (0, 0), leaders,
                                   MEDIAN_XHEIGHT)
    assert has_leader_adjacent((0, 0, 100, 10), (0, 1), leaders,
                               MEDIAN_XHEIGHT)
    assert has_leader_adjacent((0, 0, 200, 10), (0, 5), leaders,
                               MEDIAN_XHEIGHT)
    assert not has_leader_adjacent((155, 0, 200, 10), (5, 5), leaders,
                                   MEDIAN_XHEIGHT)


def _blobs(ranges):
    # blob boxes (l, bottom, r, top): lefts i+1, rights i+4, y 5..15
    return [(i + 1, 5, i + 4, 15) for lo, hi in ranges
            for i in range(lo, hi + 1, 5)]


def test_split_fragmented_partitions_basic_pass():
    # median blob width 3 -> threshold 6; gaps of 12 and 22 split.
    blobs = _blobs([(10, 20), (35, 55), (80, 95)])
    frags = split_fragmented_partition(blobs, median_width=3)
    assert frags == [(11, 5, 24, 15), (36, 5, 59, 15), (81, 5, 99, 15)]


def test_split_fragmented_partitions_basic_fail():
    # uniform 2-px gaps never reach the threshold: one partition.
    blobs = _blobs([(10, 95)])
    frags = split_fragmented_partition(blobs, median_width=3)
    assert frags == [(11, 5, 99, 15)]


def test_split_empty_partition():
    assert split_fragmented_partition([], median_width=3) == []
