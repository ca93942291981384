"""Table-region detection — the column-alignment half of the reference's
table finder (src/textord/tablefind.cpp: column partitions whose cells
align across rows become table candidates; TableFinder::LocateTables).

The signal here is the same the reference uses, re-expressed over the
layout stage's word boxes: a run of >= MIN_TABLE_ROWS consecutive rows
where (a) every row splits into the same number >= 2 of words, and
(b) each word column's left edges agree within ALIGN_TOL px across the
rows.  Detected regions are reported as (top-row index, bottom-row
index, column lefts) so callers can tag blocks PT_TABLE-style.

Spark shape: runs inside the page UDF on layout output — no extra
passes over pixels, no shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MIN_TABLE_ROWS = 3
MIN_TABLE_COLS = 2
ALIGN_TOL = 2  # px tolerance for column-edge agreement


@dataclass
class TableRegion:
    row_start: int  # index into the region's rows (inclusive)
    row_end: int  # inclusive
    col_lefts: list[int]  # representative left edge per column
    bbox: tuple[int, int, int, int]


def _row_signature(word_boxes) -> list[int] | None:
    """Column lefts of one row, or None if not table-shaped."""
    if len(word_boxes) < MIN_TABLE_COLS:
        return None
    return [int(b[0]) for b in word_boxes]


def _aligned(sig_a: list[int], sig_b: list[int]) -> bool:
    return len(sig_a) == len(sig_b) and all(
        abs(a - b) <= ALIGN_TOL for a, b in zip(sig_a, sig_b)
    )


def detect_tables(rows) -> list[TableRegion]:
    """Find maximal runs of column-aligned rows in one text region.

    ``rows``: the layout Row list (each with .word_boxes and .bbox).
    """
    sigs = [_row_signature(r.word_boxes) for r in rows]
    out: list[TableRegion] = []
    i = 0
    while i < len(rows):
        if sigs[i] is None:
            i += 1
            continue
        j = i
        while (
            j + 1 < len(rows)
            and sigs[j + 1] is not None
            and _aligned(sigs[i], sigs[j + 1])
        ):
            j += 1
        if j - i + 1 >= MIN_TABLE_ROWS:
            group = rows[i : j + 1]
            ls = np.array([r.bbox[0] for r in group])
            ts = np.array([r.bbox[1] for r in group])
            rs = np.array([r.bbox[2] for r in group])
            bs = np.array([r.bbox[3] for r in group])
            # representative lefts: median per column across the run
            cols = [
                int(np.median([sigs[k][c] for k in range(i, j + 1)]))
                for c in range(len(sigs[i]))
            ]
            out.append(
                TableRegion(
                    row_start=i,
                    row_end=j,
                    col_lefts=cols,
                    bbox=(
                        int(ls.min()),
                        int(ts.min()),
                        int(rs.max()),
                        int(bs.max()),
                    ),
                )
            )
            i = j + 1
        else:
            i += 1
    return out


def detect_column_partition_tables(regions) -> list[TableRegion]:
    """Cross-region detection: a wide-guttered table is segmented into one
    page COLUMN per table column by the layout stage; the table signal is
    then >= 2 adjacent text regions whose rows align vertically (the
    reference's actual mechanism — aligned ColPartitions,
    tablefind.cpp TableFinder::LocateTables)."""
    texts = sorted(
        (r for r in regions if r.kind == "text"), key=lambda r: r.bbox[0]
    )
    if len(texts) < MIN_TABLE_COLS:
        return []

    def table_column(reg) -> bool:
        # a table column: enough single-word rows (prose columns carry
        # multi-word lines)
        return len(reg.rows) >= MIN_TABLE_ROWS and all(
            len(row.word_boxes) == 1 for row in reg.rows
        )

    def aligned_pair(a, b) -> bool:
        return len(a.rows) == len(b.rows) and all(
            abs(ra.bbox[1] - rb.bbox[1]) <= ALIGN_TOL
            for ra, rb in zip(a.rows, b.rows)
        )

    # maximal runs of ADJACENT table-shaped columns with matching row
    # grids — a prose sidebar region breaks a run but does not veto the
    # table (the documented >= MIN_TABLE_COLS adjacent-partitions signal)
    out: list[TableRegion] = []
    i = 0
    while i < len(texts):
        if not table_column(texts[i]):
            i += 1
            continue
        j = i
        while (
            j + 1 < len(texts)
            and table_column(texts[j + 1])
            and aligned_pair(texts[i], texts[j + 1])
        ):
            j += 1
        if j - i + 1 >= MIN_TABLE_COLS:
            run = texts[i : j + 1]
            out.append(
                TableRegion(
                    row_start=0,
                    row_end=len(run[0].rows) - 1,
                    col_lefts=[int(r.bbox[0]) for r in run],
                    bbox=(
                        int(min(r.bbox[0] for r in run)),
                        int(min(r.bbox[1] for r in run)),
                        int(max(r.bbox[2] for r in run)),
                        int(max(r.bbox[3] for r in run)),
                    ),
                )
            )
        i = j + 1
    return out


def detect_page_tables(gray: np.ndarray, dpi: int = 300) -> list[TableRegion]:
    """Full-page convenience: layout then per-region + cross-region table
    detection, bboxes in page coordinates."""
    from .page import analyze_page

    layout = analyze_page(gray, dpi)
    found: list[TableRegion] = []
    for region in layout.regions:
        if region.kind != "text":
            continue
        found.extend(detect_tables(region.rows))
    if not found:
        found.extend(detect_column_partition_tables(layout.regions))
    return found


@dataclass
class StructuredTable:
    """Recognized table structure (tablerecog.cpp StructuredTable): the
    grid plus decoded cell texts in (row, col) coordinates."""

    bbox: tuple[int, int, int, int]
    n_rows: int
    n_cols: int
    cells: list[tuple[int, int, str]]  # (row_idx, col_idx, text)

    def grid(self) -> list[list[str]]:
        g = [["" for _ in range(self.n_cols)] for _ in range(self.n_rows)]
        for r, c, t in self.cells:
            if g[r][c]:
                g[r][c] += " " + t
            else:
                g[r][c] = t
        return g


def _decode_table_row(net, row, dawg, cols) -> list[tuple[int, str]]:
    """Decode one table row -> (col_idx, text) per word, honoring the
    decoder's fuzzy-space merges so box and word counts stay aligned
    (the same _merge_boxes pairing recognize_page_detail uses)."""
    from .recognize import _decode_row, _merge_boxes

    _text, words, merged, _dropped, _cols, _strip = _decode_row(
        net, row, dawg
    )
    boxes = row.word_boxes
    if merged and len(boxes) == len(words) + len(merged):
        boxes = _merge_boxes(boxes, merged)
    out: list[tuple[int, str]] = []
    for wi, w in enumerate(words):
        l = boxes[wi][0] if len(boxes) == len(words) else row.bbox[0]
        out.append((int(np.abs(cols - int(l)).argmin()), w.text))
    return out


def extract_page_tables(
    gray: np.ndarray, dpi: int = 300, dawg=None, layout=None, net=None
) -> list[StructuredTable]:
    """Table STRUCTURE recognition (tablerecog.cpp StructuredTable::
    Recognize): locate table regions (per-region runs AND the
    cross-region wide-gutter fallback, matching detect_page_tables),
    decode each table row, and assign every word to its (row, column)
    cell by nearest column left edge.

    ``layout``/``net`` accept an existing analyze_page result / template
    net so a page UDF that already ran layout does not pay it twice."""
    from ..lstm.templates import get_net
    from .page import analyze_page

    net = net or get_net()
    if layout is None:
        layout = analyze_page(gray, dpi)
    out: list[StructuredTable] = []
    for region in layout.regions:
        if region.kind != "text":
            continue
        for t in detect_tables(region.rows):
            cols = np.asarray(t.col_lefts)
            cells: list[tuple[int, int, str]] = []
            for r_i in range(t.row_start, t.row_end + 1):
                for col, text in _decode_table_row(
                    net, region.rows[r_i], dawg, cols
                ):
                    cells.append((r_i - t.row_start, col, text))
            out.append(
                StructuredTable(
                    bbox=t.bbox,
                    n_rows=t.row_end - t.row_start + 1,
                    n_cols=len(t.col_lefts),
                    cells=cells,
                )
            )
    if out:
        return out
    # wide-gutter fallback: each table column is its own text region;
    # cell (row, col) = row r of region c in the aligned run
    for t in detect_column_partition_tables(layout.regions):
        run = [
            r
            for r in layout.regions
            if r.kind == "text" and int(r.bbox[0]) in t.col_lefts
        ]
        run.sort(key=lambda r: r.bbox[0])
        cells = []
        for c_i, reg in enumerate(run):
            for r_i, row in enumerate(reg.rows):
                from .recognize import _decode_row

                _text, words, _m, _d, _c, _s = _decode_row(net, row, dawg)
                cells.append((r_i, c_i, " ".join(w.text for w in words)))
        out.append(
            StructuredTable(
                bbox=t.bbox,
                n_rows=t.row_end - t.row_start + 1,
                n_cols=len(t.col_lefts),
                cells=cells,
            )
        )
    return out
