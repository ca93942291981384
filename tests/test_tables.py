"""Table-region detection tests (tablefind.cpp LocateTables analogue)."""

import numpy as np

from tesseract_spark.functions.fonts import CELL_H, get_font, mask_to_gray, render_line
from tesseract_spark.operators.tables import detect_page_tables


def _cell_row(words: list[str], col_xs: list[int], width: int) -> np.ndarray:
    row = np.zeros((CELL_H, width), dtype=bool)
    for w, x in zip(words, col_xs):
        m = render_line(w)
        row[:, x : x + m.shape[1]] = m
    return row


def _page(rows: list[np.ndarray], vgap: int = 6) -> np.ndarray:
    w = max(r.shape[1] for r in rows) + 24
    h = len(rows) * (CELL_H + vgap) + 24
    page = np.zeros((h, w), dtype=bool)
    y = 12
    for r in rows:
        page[y : y + CELL_H, 12 : 12 + r.shape[1]] = r
        y += CELL_H + vgap
    return mask_to_gray(page)


def test_detects_aligned_table():
    cols = [0, 30, 60]  # 11px gutters: word gaps, below the column-split gutter
    rows = [
        _cell_row(["ab", "cd", "ef"], cols, 100),
        _cell_row(["gh", "ij", "kl"], cols, 100),
        _cell_row(["mn", "op", "qr"], cols, 100),
        _cell_row(["st", "uv", "wx"], cols, 100),
    ]
    tables = detect_page_tables(_page(rows))
    assert len(tables) == 1
    t = tables[0]
    assert t.row_end - t.row_start + 1 == 4
    assert len(t.col_lefts) == 3
    # columns spaced like the layout (page x = 12 + col offset)
    d = np.diff(t.col_lefts)
    assert (abs(d - 30) <= 2).all()


def test_prose_is_not_a_table():
    # different-width words shift the column lefts row to row
    rows = [
        render_line("a bb ccc"),
        render_line("dddd e ff"),
        render_line("g hhhh ii"),
        render_line("jj kk llll"),
    ]
    padded = []
    w = max(r.shape[1] for r in rows)
    for r in rows:
        p = np.zeros((CELL_H, w), dtype=bool)
        p[:, : r.shape[1]] = r
        padded.append(p)
    assert detect_page_tables(_page(padded)) == []


def test_short_run_below_min_rows_ignored():
    cols = [0, 30]
    rows = [
        _cell_row(["ab", "cd"], cols, 70),
        _cell_row(["ef", "gh"], cols, 70),  # only 2 aligned rows
        render_line("prose line here"),
    ]
    w = max(r.shape[1] for r in rows)
    padded = []
    for r in rows:
        p = np.zeros((CELL_H, w), dtype=bool)
        p[:, : r.shape[1]] = r
        padded.append(p)
    assert detect_page_tables(_page(padded)) == []


def test_wide_gutter_table_found_as_column_partitions():
    """A table whose gutters exceed the page-column threshold splits into
    one layout region per column; the cross-region detector (aligned
    ColPartitions, tablefind.cpp) still finds it."""
    cols = [0, 40, 80]  # 21px gutters -> column split at scale 1? (24 needed)
    rows = [_cell_row(["ab", "cd", "ef"], [0, 45, 90], 130) for _ in range(3)]
    tables = detect_page_tables(_page(rows))
    assert len(tables) == 1
    assert len(tables[0].col_lefts) == 3


def test_two_column_prose_is_not_a_cross_region_table():
    from tesseract_spark.fixtures import make_page_spec
    from tesseract_spark.functions.compose import compose_page

    rng = np.random.default_rng(11)
    page = compose_page(make_page_spec("two_column", rng))
    # prose columns: multi-word rows must not be claimed as a table
    for t in detect_page_tables(page.image):
        assert False, f"false positive: {t}"


def test_cross_region_table_with_prose_sidebar():
    """A prose region elsewhere on the page must not veto the detection
    of two adjacent aligned table columns."""
    cols2 = [0, 45]
    rows = []
    for a, b in (("ab", "cd"), ("ef", "gh"), ("ij", "kl")):
        rows.append(_cell_row([a, b], cols2, 130))
    # append a prose block far below (own rows, multi-word lines)
    prose = [render_line("some prose words here") for _ in range(2)]
    w = max(max(r.shape[1] for r in rows), max(p.shape[1] for p in prose))
    padded = []
    for r in rows + prose:
        p = np.zeros((CELL_H, w), dtype=bool)
        p[:, : r.shape[1]] = r
        padded.append(p)
    tables = detect_page_tables(_page(padded, vgap=6))
    # the table (2 aligned single-cell columns) is still found
    assert any(len(t.col_lefts) == 2 for t in tables)


def test_structured_table_extraction():
    """StructuredTable recognition (tablerecog.cpp): decoded cell texts
    land in the right (row, col) slots."""
    from tesseract_spark.operators.tables import extract_page_tables

    cols = [0, 30, 60]
    rows = [
        _cell_row(["ab", "cd", "ef"], cols, 100),
        _cell_row(["gh", "ij", "kl"], cols, 100),
        _cell_row(["mn", "op", "qr"], cols, 100),
        _cell_row(["st", "uv", "wx"], cols, 100),
    ]
    tables = extract_page_tables(_page(rows))
    assert len(tables) == 1
    t = tables[0]
    assert (t.n_rows, t.n_cols) == (4, 3)
    assert t.grid() == [
        ["ab", "cd", "ef"],
        ["gh", "ij", "kl"],
        ["mn", "op", "qr"],
        ["st", "uv", "wx"],
    ]


def _ruled_table_page() -> np.ndarray:
    """Aligned 4x3 table with DRAWN separator rules: vertical lines in the
    column gutters and horizontal lines in the row gaps (the ruled-form
    shape FindAndRemoveLines must lift before tablefind can see aligned
    cells, linefind.cpp:674 -> tablefind.cpp LocateTables)."""
    cols = [0, 30, 60]
    rows = [
        _cell_row(["ab", "cd", "ef"], cols, 100),
        _cell_row(["gh", "ij", "kl"], cols, 100),
        _cell_row(["mn", "op", "qr"], cols, 100),
        _cell_row(["st", "uv", "wx"], cols, 100),
    ]
    vgap = 8
    w = 100 + 24
    h = len(rows) * (CELL_H + vgap) + 24
    page = np.zeros((h, w), dtype=bool)
    y = 12
    for r in rows:
        page[y : y + CELL_H, 12 : 12 + r.shape[1]] = r
        y += CELL_H + vgap
    table_top, table_bot = 10, y - vgap + 2
    # vertical rules in the two column gutters (gutter span ~[14,30))
    for gx in (12 + 25, 12 + 55):
        page[table_top:table_bot, gx : gx + 2] = True
    # horizontal rules in the three row gaps
    for ri in range(1, 4):
        gy = 12 + ri * (CELL_H + vgap) - vgap // 2 - 1
        page[gy : gy + 2, 8 : w - 8] = True
    return mask_to_gray(page)


def test_ruled_table_rules_removed_and_structure_decoded():
    from tesseract_spark.operators.page import analyze_page
    from tesseract_spark.operators.tables import extract_page_tables

    gray = _ruled_table_page()
    layout = analyze_page(gray, 300)
    # the separators are lifted as rule vectors, not fused into text CCs
    assert layout.v_rules == 2 and layout.h_rules == 3
    assert not layout.has_music  # a ruled grid is NOT a music staff
    tables = extract_page_tables(gray, 300, layout=layout)
    assert len(tables) == 1
    t = tables[0]
    assert (t.n_rows, t.n_cols) == (4, 3)
    assert t.grid() == [
        ["ab", "cd", "ef"],
        ["gh", "ij", "kl"],
        ["mn", "op", "qr"],
        ["st", "uv", "wx"],
    ]


def test_ruled_table_on_skewed_page_decodes_all_cells():
    """The ruled table under page shear: rules staircase (deskew retry
    lifts them), and the tiny page makes the bbox skew vote genuinely
    ambiguous between grid neighbours — the PIXEL row-histogram
    refinement must pick the exact inverse slope, else glyphs shear
    internally at the rounding boundaries and cells lose characters
    (the 'ab'->'a' regression this pins)."""
    from tesseract_spark.operators.page import analyze_page
    from tesseract_spark.operators.tables import extract_page_tables

    gray = _ruled_table_page()
    mask = gray < 128
    h, w = mask.shape
    shifts = np.round(0.02 * np.arange(w)).astype(np.int64)
    pad = int(abs(shifts).max()) + 1
    sheared = np.zeros((h + 2 * pad, w), bool)
    for x in range(w):
        sheared[pad + shifts[x] : pad + shifts[x] + h, x] = mask[:, x]
    g2 = mask_to_gray(sheared)
    layout = analyze_page(g2, 300)
    assert layout.v_rules == 2 and layout.h_rules == 3
    tables = extract_page_tables(g2, 300, layout=layout)
    assert len(tables) == 1
    t = tables[0]
    assert (t.n_rows, t.n_cols) == (4, 3)
    assert [c[2] for c in t.cells] == [
        "ab", "cd", "ef", "gh", "ij", "kl",
        "mn", "op", "qr", "st", "uv", "wx",
    ]


# ---------------------------------------------------------------------------
# RecognizeWhitespacedTable border search (tablerecog.cpp:908-1045):
# fixtures in the reference's bottom-up (l, bottom, r, top) frame

from tesseract_spark.operators.tables import (  # noqa: E402
    next_horizontal_split,
    recognize_whitespaced_table,
)


def _grid_parts(n_rows=40, n_cols=20, row_h=20, col_w=25, y0=0):
    """tablerecog_test.cc InsertPartitions: n_rows x n_cols fake cells
    (col*25+1, row*20+1, col*25+24, row*20+19), median_width 3."""
    return [
        ((col * col_w + 1, y0 + row * row_h + 1,
          col * col_w + col_w - 1, y0 + row * row_h + row_h - 1), 3)
        for row in range(n_rows)
        for col in range(n_cols)
    ]


def test_recognize_whitespaced_table_basic():
    # RecognizeWhitespacedTableBasic (tablerecog_test.cc:226-244)
    parts = _grid_parts()
    table = recognize_whitespaced_table(parts, (0, 0, 500, 800))
    assert table is not None
    assert table.bounding_box == (1, 1, 499, 799)
    assert table.column_count() == 500 // 25
    assert table.row_count() == 800 // 20
    assert table.cell_count() == (500 // 25) * (800 // 20)
    assert not table.is_lined


def test_next_horizontal_split_walks_gaps():
    parts = _grid_parts(n_rows=3, n_cols=4)  # rows at y 1-19, 21-39, 41-59
    # from the middle of row 1 going down: band [1,19] -> split at 1
    assert next_horizontal_split(parts, 0, 100, 30, True) == 21
    assert next_horizontal_split(parts, 0, 100, 10, True) == 1
    # going up from inside row 1: band merges to top of row (19), next
    # call from there crosses the gap into row 2's band
    assert next_horizontal_split(parts, 0, 100, 30, False) == 39
    assert next_horizontal_split(parts, 0, 100, 39, False) == 59


def test_whitespaced_table_sheds_far_footer():
    # a wide footer line far below the grid: once the walk has
    # established the 4-column structure and the big below-margin at
    # the last data row, the footer step bridges columns (2 < 4 *
    # kRequiredColumns) and is rejected — the border stays on the data
    parts = _grid_parts(n_rows=6, n_cols=4, y0=100)  # rows y 101..219
    footer = ((1, 1, 60, 19), 3)  # 82px below the last data row
    table = recognize_whitespaced_table(
        parts + [footer], (0, 60, 100, 260)
    )
    assert table is not None
    # bottom border lands on the grid's first data row, not the footer
    assert table.bounding_box[1] == 101
    assert table.row_count() == 6
    assert table.column_count() == 4


def test_whitespaced_table_sheds_far_header():
    parts = _grid_parts(n_rows=6, n_cols=4, y0=100)
    header = ((1, 301, 60, 319), 3)  # 82px above the top data row
    table = recognize_whitespaced_table(
        parts + [header], (0, 60, 100, 260)
    )
    assert table is not None
    assert table.bounding_box[3] == 219  # top of the 6th data row
    assert table.row_count() == 6
    assert table.column_count() == 4


def test_whitespaced_table_keeps_near_multi_cell_rows():
    # multi-cell rows at normal pitch are data, not header/footer:
    # nothing is shed even though the margin rule alone wouldn't add them
    parts = _grid_parts(n_rows=8, n_cols=4)
    table = recognize_whitespaced_table(parts, (0, 0, 100, 160))
    assert table is not None
    assert table.row_count() == 8
