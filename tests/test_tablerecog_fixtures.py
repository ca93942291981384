"""Port of unittest/tablerecog_test.cc over the TableStructure /
recognize_*_table surface.  Boxes are (l, bottom, r, top) bottom-up and
the fixture geometry is the reference's own (SharedTest::InsertLines /
InsertPartitions / InsertCellsInLines with gridsize 5)."""

from tesseract_spark.operators.tables import (
    TableStructure,
    find_lines_bounding_box,
    has_significant_lines,
    recognize_lined_table,
    recognize_whitespaced_table,
)

GRIDSIZE = 5
# line_box_: (100 - g, 10 - g, 450 + g, 50 + g)
LINE_BOX = (100 - GRIDSIZE, 10 - GRIDSIZE, 450 + GRIDSIZE, 50 + GRIDSIZE)


def _insert_lines():
    lines = []
    for y in range(10, 51, 10):
        lines.append(("h", (100, y - GRIDSIZE, 450, y + GRIDSIZE)))
    for x in range(100, 451, 50):
        lines.append(("v", (x - GRIDSIZE, 10, x + GRIDSIZE, 50)))
    for y in range(100, 201, 20):  # unrelated lines above-left
        lines.append(("h", (0, y - GRIDSIZE, 100, y + GRIDSIZE)))
    return lines


def _insert_partitions():
    # 20 columns x 40 rows of text partitions, median width 3
    return [((col + 1, row + 1, col + 24, row + 19), 3)
            for row in range(0, 800, 20) for col in range(0, 500, 25)]


def _cells_in_lines():
    return [((x + 1, y + 1, x + 49, y + 9), 3)
            for y in range(10, 51, 10) for x in range(100, 451, 50)]


def test_has_significant_lines_basic_pass():
    lines = _insert_lines()
    assert has_significant_lines(lines, LINE_BOX)
    assert has_significant_lines(lines, (90, 5, 490, 70))
    assert has_significant_lines(lines, (120, 15, 370, 45))


def test_has_significant_lines_basic_fail():
    assert not has_significant_lines(_insert_lines(), (370, 35, 500, 45))


def test_has_significant_lines_horizontal_only_fails():
    assert not has_significant_lines(_insert_lines(), (0, 100, 200, 200))


def test_find_lines_bounding_box_basic():
    box = find_lines_bounding_box(_insert_lines(), (0, 0, 200, 50))
    assert box == LINE_BOX


def test_recognize_lined_table_basic():
    table = recognize_lined_table([], _insert_lines(), (120, 15, 370, 45))
    assert table is not None
    assert table.bounding_box == LINE_BOX
    assert table.column_count() == 7
    assert table.row_count() == 4
    assert table.cell_count() == 28
    assert table.is_lined


def test_recognize_whitespaced_table_basic():
    table = recognize_whitespaced_table(_insert_partitions(), (0, 0, 500, 800))
    assert table is not None
    l, b, r, t = table.bounding_box
    assert (l, b, r, t) == (1, 1, 499, 799)
    assert (t - b) * (r - l) == 798 * 498
    assert table.column_count() == 500 // 25
    assert table.row_count() == 800 // 20
    assert table.cell_count() == 500 * 800 // 20 // 25
    assert not table.is_lined


def test_count_vertical_intersections_all():
    table = TableStructure([((0, 0, 100, 10), 3), ((1, 12, 43, 21), 3)])
    table.bounding_box = (0, 0, 1000, 1000)
    for x, expected in [(4, 2), (20, 2), (40, 2), (50, 1), (60, 1),
                        (80, 1), (95, 1), (104, 0), (150, 0)]:
        assert table.count_vertical_intersections(x) == expected, x


def test_count_horizontal_intersections_all():
    table = TableStructure([((0, 3, 100, 10), 3), ((110, 5, 200, 16), 3)])
    table.bounding_box = (0, 0, 1000, 1000)
    for y, expected in [(0, 0), (4, 1), (8, 2), (12, 1), (20, 0)]:
        assert table.count_horizontal_intersections(y) == expected, y


def _verify_table(extra_parts=()):
    table = TableStructure(_cells_in_lines() + list(extra_parts),
                           _insert_lines())
    table.cell_y = list(range(10, 51, 10))
    table.cell_x = list(range(100, 451, 50))
    table.bounding_box = LINE_BOX
    return table


def test_verify_lined_table_basic_pass():
    assert _verify_table().verify_lined_table_cells()


def test_verify_lined_table_horizontal_fail():
    # a partition spanning several columns crosses vertical cell borders
    assert not _verify_table(
        [((101, 11, 299, 19), 3)]).verify_lined_table_cells()


def test_verify_lined_table_vertical_fail():
    # a partition spanning two rows crosses a horizontal cell border
    assert not _verify_table(
        [((151, 21, 199, 39), 3)]).verify_lined_table_cells()


def test_find_whitespaced_columns_basic_and_sorted():
    table = TableStructure(_insert_partitions())
    table.bounding_box = (0, 0, 500, 800)
    table.find_whitespaced_columns()
    # ExpectCellX(1, 25, 25, 475, 499)
    assert table.cell_x[0] == 1 and table.cell_x[-1] == 499
    assert table.cell_x[1:-1] == list(range(25, 476, 25))
    assert all(a < b for a, b in zip(table.cell_x, table.cell_x[1:]))


def test_intersections_ignore_text_outside_table_extent():
    """The reference's intersection search keeps the table box's
    perpendicular extent: a paragraph below the table (or beside it)
    must not veto cell borders."""
    parts = _cells_in_lines() + [((101, 200, 299, 220), 3),   # below
                                 ((600, 11, 780, 19), 3)]     # beside
    table = TableStructure(parts, _insert_lines())
    table.cell_y = list(range(10, 51, 10))
    table.cell_x = list(range(100, 451, 50))
    table.bounding_box = LINE_BOX
    assert table.verify_lined_table_cells()
