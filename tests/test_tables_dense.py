"""Grid-bucketed / vectorized partner-search scans (BBGrid analogue).

The reference accelerates partner/merge scans with ColPartitionGrid
(bbgrid.h; colpartitiongrid.cpp:1212 FindPartitionPartners); this
engine's analogues are BoxGrid bucket queries (equation seed expansion)
and vectorized numpy part-table scans (TableStructure).  These tests
pin (a) exact parity with the flat scans on randomized fixtures and
(b) that a pathological dense page stays within a fixed multiple of a
normal page instead of going quadratic.
"""

import time

import numpy as np
import pytest

from tesseract_spark.operators import equation as EQ
from tesseract_spark.operators.boxgrid import BoxGrid
from tesseract_spark.operators.tables import (
    TableStructure,
    _boxes_overlap,
    next_horizontal_split,
    recognize_whitespaced_table,
)


def _rand_boxes(rng, n, span=3000, wmax=220):
    l = rng.integers(0, span, n)
    t = rng.integers(0, span, n)
    return np.stack(
        [l, t, l + rng.integers(1, wmax, n), t + rng.integers(1, 40, n)],
        axis=1,
    )


# ---------------------------------------------------------------------------
# BoxGrid vs brute force
# ---------------------------------------------------------------------------


def test_boxgrid_overlapping_matches_brute_force():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(0, 150))
        boxes = _rand_boxes(rng, n)
        grid = BoxGrid(boxes, gridsize=int(rng.integers(8, 128)))
        for _q in range(8):
            ql, qt = rng.integers(-100, 3100, 2)
            rect = (ql, qt, ql + int(rng.integers(0, 600)),
                    qt + int(rng.integers(0, 600)))
            got = set(grid.overlapping(rect).tolist())
            want = {
                int(i) for i in range(n)
                if _boxes_overlap(boxes[i], rect)
            }
            assert got == want


def test_boxgrid_query_is_superset_of_overlaps():
    rng = np.random.default_rng(8)
    boxes = _rand_boxes(rng, 300)
    grid = BoxGrid(boxes)
    rect = (500, 500, 900, 900)
    assert set(grid.overlapping(rect)) <= set(grid.query(rect))


# ---------------------------------------------------------------------------
# TableStructure vectorized scans == the flat reference predicates
# ---------------------------------------------------------------------------


def _flat_count_vertical(table, x):
    count = 0
    for box, _mw in table.text_parts:
        if table.bounding_box is not None and (
                box[3] < table.bounding_box[1]
                or box[1] > table.bounding_box[3]):
            continue
        if box[0] < x < box[2]:
            count += 1
    return count


def _flat_count_filled(table, row):
    filled = 0
    for col in range(table.column_count()):
        cell = (table.cell_x[col], table.cell_y[row],
                table.cell_x[col + 1], table.cell_y[row + 1])
        if sum(1 for b, _mw in table.text_parts
               if _boxes_overlap(b, cell)) > 0:
            filled += 1
    return filled


def test_table_scans_match_flat_reference():
    rng = np.random.default_rng(11)
    for _trial in range(15):
        n = int(rng.integers(1, 80))
        boxes = _rand_boxes(rng, n, span=1200, wmax=150)
        parts = [(tuple(int(v) for v in b), float(rng.integers(5, 30)))
                 for b in boxes]
        table = TableStructure(parts)
        table.bounding_box = (100, 100, 1100, 1100)
        for x in rng.integers(0, 1300, 10):
            assert table.count_vertical_intersections(int(x)) == \
                _flat_count_vertical(table, int(x))
        # exercise the full whitespaced pipeline for structural parity
        if table.find_whitespaced_structure():
            for row in range(table.row_count()):
                assert table.count_filled_cells_in_row(row) == \
                    _flat_count_filled(table, row)


def test_next_horizontal_split_matches_flat_reference():
    rng = np.random.default_rng(13)
    boxes = _rand_boxes(rng, 60, span=800, wmax=100)
    parts = [(tuple(int(v) for v in b), 10.0) for b in boxes]

    def flat(left, right, y, ttb):
        cands = []
        for box, _mw in parts:
            if box[2] < left or box[0] > right:
                continue
            if ttb and box[1] <= y:
                cands.append((-min(box[3], y), box))
            elif not ttb and box[3] >= y:
                cands.append((max(box[1], y), box))
        last_y = y
        for _e, box in sorted(cands, key=lambda c: c[0]):
            if ttb:
                if last_y >= y or last_y <= box[3]:
                    last_y = min(last_y, box[1])
                    continue
            else:
                if last_y <= y or last_y >= box[1]:
                    last_y = max(last_y, box[3])
                    continue
            return last_y
        return last_y

    for _ in range(40):
        y = int(rng.integers(0, 900))
        l = int(rng.integers(0, 400))
        r = l + int(rng.integers(100, 500))
        for ttb in (True, False):
            assert next_horizontal_split(parts, l, r, y, ttb) == \
                flat(l, r, y, ttb), (l, r, y, ttb)


# ---------------------------------------------------------------------------
# equation expansion: grid candidates == flat candidates
# ---------------------------------------------------------------------------


def test_equation_scans_grid_matches_flat():
    rng = np.random.default_rng(17)
    for _trial in range(10):
        n = 80
        boxes = [tuple(int(v) for v in b)
                 for b in _rand_boxes(rng, n, span=2000, wmax=300)]
        kinds = ["equation" if rng.random() < 0.3 else "text"
                 for _ in range(n)]
        texts = ["x=1+2" if k == "equation" else "plain words here"
                 for k in kinds]
        alive = [bool(rng.random() < 0.9) for _ in range(n)]
        grid = BoxGrid(boxes, gridsize=60)
        dirty = {int(i) for i in rng.integers(0, n, 3)}
        for s in range(0, n, 7):
            for down in (True, False):
                assert EQ._expand_vertical(
                    s, down, boxes, kinds, texts, alive, 300
                ) == EQ._expand_vertical(
                    s, down, boxes, kinds, texts, alive, 300, grid, dirty
                )
            for left in (True, False):
                assert EQ._expand_horizontal(
                    s, left, boxes, kinds, texts, alive, 300
                ) == EQ._expand_horizontal(
                    s, left, boxes, kinds, texts, alive, 300, grid, dirty
                )
            assert EQ._search_by_overlap(
                s, boxes, kinds, alive
            ) == EQ._search_by_overlap(s, boxes, kinds, alive, grid, dirty)


# ---------------------------------------------------------------------------
# pathological dense pages stay bounded
# ---------------------------------------------------------------------------


def _time(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def test_dense_whitespaced_table_bounded():
    """10k text partitions through the whitespaced-table border search:
    must finish in bounded time (the flat python scans were
    O(splits x parts x cols)) and still find the grid structure."""
    rows, cols = 100, 100
    parts = []
    for r in range(rows):
        for c in range(cols):
            x, y = 50 + c * 30, 50 + r * 24
            parts.append(((x, y, x + 18, y + 12), 18.0))
    guess = (0, 0, 50 + cols * 30, 50 + rows * 24)
    el, table = _time(
        lambda: recognize_whitespaced_table(parts, guess, min_height=40)
    )
    assert table is not None
    assert table.row_count() >= rows - 2
    assert table.column_count() == cols
    # generous absolute bound: quadratic python scans took minutes here
    assert el < 20.0, f"dense table recognition took {el:.1f}s"


def test_dense_page_within_fixed_multiple_of_normal():
    """analyze_page on a >=10k-blob page stays within a fixed multiple
    of a normal ~350-blob page (the straggler-task guard the reference
    gets from BBGrid bucketing)."""
    from tesseract_spark.functions.fonts import mask_to_gray, render_line
    from tesseract_spark.operators.page import analyze_page

    masks = [render_line(f"the quick brown fox {i}") for i in range(20)]
    W = max(m.shape[1] for m in masks) + 20
    H = sum(m.shape[0] + 10 for m in masks) + 20
    page = np.zeros((H, W), bool)
    y = 10
    for m in masks:
        page[y:y + m.shape[0], 10:10 + m.shape[1]] = m
        y += m.shape[0] + 10
    t_norm, res_norm = _time(lambda: analyze_page(mask_to_gray(page)))
    assert res_norm.n_blobs > 100

    dense = np.zeros((2440, 1440), bool)
    for r in range(100):
        yy = 20 + r * 24
        x = 20
        for g in range(100):
            w = 8 + (g % 3)
            h = 12 if g % 7 else 16
            dense[yy + (16 - h):yy + 16, x:x + w] = True
            x += w + (6 if g % 5 == 4 else 2)
    t_dense, res_dense = _time(lambda: analyze_page(mask_to_gray(dense)))
    assert res_dense.n_blobs >= 9000
    # ~28x the blobs may cost ~28x the work plus constant page overhead,
    # but must never go quadratic (~800x).  Generous fixed multiple:
    assert t_dense < 60 * t_norm + 2.0, (t_dense, t_norm)
