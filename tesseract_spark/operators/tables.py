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


# --- tablefind.cpp scalar predicates (unittest/tablefind_test.cc) ----

K_MIN_ROWS_IN_TABLE = 3  # tablefind.cpp:110
K_SMALL_TABLE_PROJECTION_THRESHOLD = 0.35  # :104
K_LARGE_TABLE_PROJECTION_THRESHOLD = 0.45  # :105
K_LARGE_TABLE_ROW_COUNT = 6  # :107
K_MAX_X_PROJECTION_GAP_FACTOR = 2.0  # :134
K_ADJACENT_LEADER_SEARCH_PADDING = 2  # :115
K_SPLIT_PARTITION_SIZE = 2.0  # :42


def gap_in_x_projection(xprojection, median_xheight: int) -> bool:
    """TableFinder::GapInXProjection (tablefind.cpp:1826-1866): does a
    column-candidate's x-projection (count of horizontally overlapping
    partitions per x) contain a wide empty gap — evidence the "table"
    is really two separate columns of text."""
    proj = [int(v) for v in xprojection]
    peak = max(proj, default=0)
    if peak < K_MIN_ROWS_IN_TABLE:
        return False
    threshold = K_SMALL_TABLE_PROJECTION_THRESHOLD * peak
    if peak >= K_LARGE_TABLE_ROW_COUNT:
        threshold = K_LARGE_TABLE_PROJECTION_THRESHOLD * peak
    bits = [1 if v >= threshold else 0 for v in proj]
    largest_gap = 0
    run_start = -1
    for i in range(1, len(bits)):
        if bits[i - 1] and not bits[i]:
            run_start = i
        if run_start != -1 and not bits[i - 1] and bits[i]:
            largest_gap = max(largest_gap, i - run_start)
    return largest_gap > K_MAX_X_PROJECTION_GAP_FACTOR * median_xheight


def _v_significant_core_overlap(a, b) -> bool:
    # ColPartition::VSignificantCoreOverlap (colpartition.h:390-398)
    # over (l, bottom, r, top) bottom-up boxes using box bounds as the
    # medians (FakePartition semantics).
    overlap = min(a[3], b[3]) - max(a[1], b[1])
    height = min(a[3] - a[1], b[3] - b[1])
    return overlap * 3 > height


def has_leader_adjacent(
    part_box,
    part_cols,
    leaders,
    median_xheight: int,
) -> bool:
    """TableFinder::HasLeaderAdjacent (tablefind.cpp:962-1002): is a
    leader (dot-run) partition horizontally adjacent to this partition
    within a padded y band, sharing a page column, with significant
    vertical core overlap?  Boxes are (l, bottom, r, top) bottom-up as
    in the reference; ``leaders`` is [(box, first_col, last_col)];
    ``part_cols`` = (first_col, last_col)."""
    from .tabs import columns_overlap

    l, bottom, r, top = part_box
    pad = K_ADJACENT_LEADER_SEARCH_PADDING * median_xheight
    band_top, band_bottom = top + pad, bottom - pad
    # Side search outward from each edge: candidates ordered by
    # horizontal distance (0 when overlapping), nearest first; a
    # column-mismatched leader BREAKS the direction (grid search stops).
    for edge in (r, l):
        cands = []
        for box, first_col, last_col in leaders:
            if box[1] > band_top or box[3] < band_bottom:
                continue  # outside the padded y band
            dist = max(box[0] - edge, edge - box[2], 0)
            cands.append((dist, box, first_col, last_col))
        for _d, box, first_col, last_col in sorted(cands, key=lambda c: c[0]):
            if not columns_overlap(part_cols[0], part_cols[1],
                                   first_col, last_col):
                break
            if _v_significant_core_overlap(part_box, box):
                return True
    return False


def split_fragmented_partition(blob_boxes, median_width: int):
    """TableFinder::SplitAndInsertFragmentedTextPartition
    (tablefind.cpp:430-478): split a text partition wherever the gap
    between consecutive blobs exceeds median_width x
    kSplitPartitionSize; returns the fragment bounding boxes
    (l, bottom, r, top).  ``blob_boxes`` sorted left-first."""
    if not blob_boxes:
        return []
    threshold = median_width * K_SPLIT_PARTITION_SIZE
    fragments = []
    current: list = []
    previous_right = None
    for box in sorted(blob_boxes, key=lambda b: b[0]):
        if previous_right is not None and box[0] - previous_right > threshold:
            fragments.append(current)
            current = []
            previous_right = None
        current.append(box)
        previous_right = box[2] if previous_right is None else max(
            previous_right, box[2])
    fragments.append(current)
    return [
        (
            min(b[0] for b in frag),
            min(b[1] for b in frag),
            max(b[2] for b in frag),
            max(b[3] for b in frag),
        )
        for frag in fragments
    ]


# --- tablerecog.cpp structural recognizer (unittest/tablerecog_test.cc)

K_HORIZONTAL_SPACING = 0.30  # tablerecog.cpp:34
K_VERTICAL_SPACING = -0.2  # :37
K_CELL_SPLIT_ROW_THRESHOLD = 0  # :40
K_CELL_SPLIT_COLUMN_THRESHOLD = 0  # :41
K_LINED_TABLE_MIN_VERTICAL_LINES = 3  # :43
K_LINED_TABLE_MIN_HORIZONTAL_LINES = 3  # :44


def _trunc(v: float) -> int:
    """C++ static_cast<int>: truncate toward zero."""
    return int(v)


class TableStructure:
    """StructuredTable's grid-structure half (tablerecog.cpp:100-757):
    derive a table's cell split positions (cell_x / cell_y) from line
    partitions (lined tables) or from whitespace valleys between text
    partitions (whitespaced tables), and verify that no text partition
    crosses a cell border.

    Boxes are (l, bottom, r, top) BOTTOM-UP like the reference.  The
    reference indexes partitions in a ColPartitionGrid as a search
    accelerator (bbgrid.h; colpartitiongrid.cpp); inside an Arrow batch
    the analogue is one numpy part table scanned with vectorized masks —
    every border probe / cell count / margin search is O(parts) SIMD
    instead of an O(parts) Python loop, and the cell-coverage count is
    O(parts + cells) via interval marking, so a pathological dense page
    (10k+ partitions) stays bounded instead of going quadratic (see
    tests/test_tables_dense.py)."""

    def __init__(self, text_parts=None, line_parts=None,
                 max_text_height: int = 1 << 31) -> None:
        # text_parts: [(box, median_width)] ; line_parts: [("h"|"v", box)]
        self.text_parts = list(text_parts or [])
        self.line_parts = list(line_parts or [])
        self._tb = np.asarray(
            [b for b, _mw in self.text_parts], dtype=np.int64
        ).reshape(-1, 4)
        self._tmw = np.asarray(
            [mw for _b, mw in self.text_parts], dtype=np.float64
        )
        self._lb = np.asarray(
            [b for _k, b in self.line_parts], dtype=np.int64
        ).reshape(-1, 4)
        self.max_text_height = max_text_height
        self.bounding_box: tuple[int, int, int, int] | None = None
        self.cell_x: list[int] = []
        self.cell_y: list[int] = []
        self.is_lined = False

    # counts --------------------------------------------------------
    def row_count(self) -> int:
        return max(0, len(self.cell_y) - 1)

    def column_count(self) -> int:
        return max(0, len(self.cell_x) - 1)

    def cell_count(self) -> int:
        return self.row_count() * self.column_count()

    def count_vertical_intersections(self, x: int) -> int:
        # tablerecog.cpp:673-696: strictly-crossing text partitions.
        # The reference restricts the search to the TABLE's y-extent
        # (the search box keeps bounding_box_'s bottom/top) — a
        # paragraph outside the table must not veto its cell borders.
        if len(self._tb) == 0:
            return 0
        B = self._tb
        m = (B[:, 0] < x) & (x < B[:, 2])
        if self.bounding_box is not None:
            m &= ~((B[:, 3] < self.bounding_box[1])
                   | (B[:, 1] > self.bounding_box[3]))
        return int(m.sum())

    def count_horizontal_intersections(self, y: int) -> int:
        # Restricted to the table's x-extent, like the vertical twin.
        if len(self._tb) == 0:
            return 0
        B = self._tb
        m = (B[:, 1] < y) & (y < B[:, 3])
        if self.bounding_box is not None:
            m &= ~((B[:, 2] < self.bounding_box[0])
                   | (B[:, 0] > self.bounding_box[2]))
        return int(m.sum())

    # lined structure ----------------------------------------------
    def find_lined_structure(self) -> bool:
        """FindLinedStructure (:157-207): cell borders at line midpoints,
        outer borders at the line-box extents."""
        assert self.bounding_box is not None
        l, b, r, t = self.bounding_box
        self.cell_x, self.cell_y = [], []
        for kind, box in self.line_parts:
            if not _boxes_overlap(box, self.bounding_box):
                continue
            if kind == "h":
                self.cell_y.append((box[1] + box[3]) // 2)
            else:
                self.cell_x.append((box[0] + box[2]) // 2)
        if len(self.cell_x) < 3 or len(self.cell_y) < 3:
            return False
        self.cell_x = sorted(set(self.cell_x))
        self.cell_y = sorted(set(self.cell_y))
        self.cell_x[0], self.cell_x[-1] = l, r
        self.cell_y[0], self.cell_y[-1] = b, t
        self.cell_x = sorted(set(self.cell_x))
        self.cell_y = sorted(set(self.cell_y))
        self.is_lined = self.verify_lined_table_cells()
        return self.is_lined

    def verify_lined_table_cells(self) -> bool:
        # :350-368 — no text partition may cross any cell border.
        for y in self.cell_y:
            if self.count_horizontal_intersections(y) > 0:
                return False
        for x in self.cell_x:
            if self.count_vertical_intersections(x) > 0:
                return False
        return True

    # whitespaced structure ----------------------------------------
    def _in_box_mask(self) -> np.ndarray:
        bb = self.bounding_box
        B = self._tb
        return (
            (B[:, 0] <= bb[2]) & (B[:, 2] >= bb[0])
            & (B[:, 1] <= bb[3]) & (B[:, 3] >= bb[1])
        )

    def find_whitespaced_columns(self) -> None:
        """FindWhitespacedColumns (:384-422): column splits at valleys of
        the padded left/right-side interval stack."""
        if len(self._tb) == 0:
            return
        m = self._in_box_mask()
        if not m.any():
            return
        # C++ static_cast<int> truncation; median widths are positive
        spacing = np.trunc(
            self._tmw[m] * K_HORIZONTAL_SPACING / 2.0 + 0.5
        ).astype(np.int64)
        left_sides = np.sort(self._tb[m, 0] - spacing)
        right_sides = np.sort(self._tb[m, 2] + spacing)
        self.cell_x = _find_cell_split_locations(
            left_sides.tolist(), right_sides.tolist(),
            K_CELL_SPLIT_COLUMN_THRESHOLD)

    def find_whitespaced_rows(self) -> None:
        """FindWhitespacedRows (:429-494): like columns but with negative
        vertical padding (skew tolerance) and tall-partition filtering;
        outer borders snap to the true ink extents."""
        if len(self._tb) == 0:
            return
        m = self._in_box_mask()
        if not m.any():
            return
        B = self._tb[m]
        min_bottom = int(B[:, 1].min())
        max_top = int(B[:, 3].max())
        h = B[:, 3] - B[:, 1]
        keep = h <= self.max_text_height
        # kVerticalSpacing is negative: trunc toward zero like the C cast
        spacing = np.trunc(
            h[keep] * K_VERTICAL_SPACING / 2.0 + 0.5
        ).astype(np.int64)
        bottoms = B[keep, 1] - spacing
        tops = B[keep, 3] + spacing
        ok = bottoms < tops
        if not ok.any():
            return
        self.cell_y = _find_cell_split_locations(
            np.sort(bottoms[ok]).tolist(), np.sort(tops[ok]).tolist(),
            K_CELL_SPLIT_ROW_THRESHOLD)
        self.cell_y[0] = min_bottom
        self.cell_y[-1] = max_top

    def find_whitespaced_structure(self) -> bool:
        # :210-231.
        self.cell_x, self.cell_y = [], []
        self.find_whitespaced_columns()
        self.find_whitespaced_rows()
        # VerifyWhitespacedTable (:374-377): at least 2x3 or 3x2.
        if not (self.row_count() >= 2 and self.column_count() >= 2
                and self.cell_count() >= 6):
            return False
        self.bounding_box = (self.cell_x[0], self.cell_y[0],
                             self.cell_x[-1], self.cell_y[-1])
        self.is_lined = False
        self.calculate_margins()
        self.calculate_stats()
        return True

    # margins & stats (CalculateMargins :496-549, CalculateStats :552-566,
    # CountPartitions :727-739, row_height :135-138) — the border-search
    # scoring inputs of RecognizeWhitespacedTable
    def count_partitions(self, box) -> int:
        if len(self._tb) == 0:
            return 0
        B = self._tb
        m = (
            (B[:, 0] <= box[2]) & (B[:, 2] >= box[0])
            & (B[:, 1] <= box[3]) & (B[:, 3] >= box[1])
        )
        return int(m.sum())

    def count_filled_cells_in_row(self, row: int) -> int:
        # O(parts + columns) interval marking instead of columns x parts
        # probes: each part overlapping the row band covers a contiguous
        # run of columns (cell_x is sorted); union the runs with a
        # difference array.
        ncols = self.column_count()
        if ncols == 0 or len(self._tb) == 0:
            return 0
        B = self._tb
        y0, y1 = self.cell_y[row], self.cell_y[row + 1]
        band = (B[:, 1] <= y1) & (B[:, 3] >= y0)
        if not band.any():
            return 0
        xs = np.asarray(self.cell_x, dtype=np.int64)
        l, r = B[band, 0], B[band, 2]
        # first col whose right border >= part left; last col whose left
        # border <= part right (closed-interval overlap, as
        # count_partitions uses)
        lo = np.searchsorted(xs[1:], l, side="left")
        hi = np.searchsorted(xs[:-1], r, side="right") - 1
        # lo > hi exactly when the part lies outside the grid's x-range
        ok = lo <= hi
        if not ok.any():
            return 0
        cover = np.zeros(ncols + 1, dtype=np.int64)
        np.add.at(cover, lo[ok], 1)
        np.add.at(cover, hi[ok] + 1, -1)
        return int((np.cumsum(cover[:-1]) > 0).sum())

    def row_height(self, row: int) -> int:
        return self.cell_y[row + 1] - self.cell_y[row]

    def calculate_margins(self) -> None:
        """Nearest text/line partition beyond each border, restricted to
        the border's cross extent (FindVerticalMargin/FindHorizontalMargin,
        tablerecog.cpp:518-549).  INT32_MAX when the page is clear."""
        big = 1 << 31
        l, b, r, t = self.bounding_box
        if len(self._tb) or len(self._lb):
            bx = np.concatenate([self._tb, self._lb], axis=0)
        else:
            bx = np.empty((0, 4), dtype=np.int64)

        def _min_or_big(vals: np.ndarray) -> int:
            return int(vals.min()) if len(vals) else big

        in_x = (bx[:, 0] <= r) & (bx[:, 2] >= l)
        in_y = (bx[:, 1] <= t) & (bx[:, 3] >= b)
        below = b - bx[in_x, 3]
        above = bx[in_x, 1] - t
        left = l - bx[in_y, 2]
        right = bx[in_y, 0] - r
        self.space_below = _min_or_big(below[below >= 0])
        self.space_above = _min_or_big(above[above >= 0])
        self.space_left = _min_or_big(left[left >= 0])
        self.space_right = _min_or_big(right[right >= 0])

    def calculate_stats(self) -> None:
        """Median cell height/width, each row/column weighted by its
        cross-count (CalculateStats, :552-566)."""
        hs = sorted(
            h
            for i in range(self.row_count())
            for h in [self.row_height(i)] * self.column_count()
        )
        ws = sorted(
            w
            for i in range(self.column_count())
            for w in [self.cell_x[i + 1] - self.cell_x[i]] * self.row_count()
        )
        self.median_cell_height = hs[len(hs) // 2] if hs else 0
        self.median_cell_width = ws[len(ws) // 2] if ws else 0


def _boxes_overlap(a, b) -> bool:
    return (a[0] <= b[2] and a[2] >= b[0]
            and a[1] <= b[3] and a[3] >= b[1])


def _find_cell_split_locations(min_list, max_list, max_merged):
    """FindCellSplitLocations (tablerecog.cpp:630-669): sweep the merged
    interval-endpoint list; a split lands mid-valley wherever the stack
    of open intervals dips to <= max_merged."""
    locations = [min_list[0]]
    min_index = max_index = 0
    stacked = 0
    last_cross = None
    while min_index < len(min_list):
        if min_list[min_index] < max_list[max_index]:
            stacked += 1
            if last_cross is not None and stacked > max_merged:
                locations.append((last_cross + min_list[min_index]) // 2)
                last_cross = None
            min_index += 1
        else:
            stacked -= 1
            if last_cross is None and stacked <= max_merged:
                last_cross = max_list[max_index]
            max_index += 1
    locations.append(max_list[-1])
    return locations


def has_significant_lines(line_parts, guess) -> bool:
    """TableRecognizer::HasSignificantLines (tablerecog.cpp:806-825):
    >= 3 vertical AND >= 3 horizontal line partitions inside the guess."""
    h = sum(1 for k, box in line_parts
            if k == "h" and _boxes_overlap(box, guess))
    v = sum(1 for k, box in line_parts
            if k == "v" and _boxes_overlap(box, guess))
    return (v >= K_LINED_TABLE_MIN_VERTICAL_LINES
            and h >= K_LINED_TABLE_MIN_HORIZONTAL_LINES)


def find_lines_bounding_box(line_parts, box):
    """FindLinesBoundingBox (:847-891): iterate to the fixed point of
    'bounding box of all lines overlapping the box' (first iteration may
    shrink to the line extents; later ones only grow).  Returns the
    stable box or None when no lines overlap."""
    current = None
    for _k, lbox in line_parts:
        if _boxes_overlap(lbox, box):
            current = lbox if current is None else (
                min(current[0], lbox[0]), min(current[1], lbox[1]),
                max(current[2], lbox[2]), max(current[3], lbox[3]))
    if current is None:
        return None
    while True:
        grown = current
        for _k, lbox in line_parts:
            if _boxes_overlap(lbox, grown):
                grown = (min(grown[0], lbox[0]), min(grown[1], lbox[1]),
                         max(grown[2], lbox[2]), max(grown[3], lbox[3]))
        if grown == current:
            return current
        current = grown


def recognize_lined_table(text_parts, line_parts, guess):
    """RecognizeLinedTable (:788-798)."""
    if not has_significant_lines(line_parts, guess):
        return None
    bound = find_lines_bounding_box(line_parts, guess)
    if bound is None:
        return None
    table = TableStructure(text_parts, line_parts)
    table.bounding_box = bound
    return table if table.find_lined_structure() else None


K_REQUIRED_COLUMNS = 0.7  # tablerecog.cpp:47
K_MARGIN_FACTOR = 1.1  # tablerecog.cpp:49
K_MAX_ROW_SIZE = 2.5  # tablerecog.cpp:52
K_MAX_CHANCES = 10  # tablerecog.cpp:939


def next_horizontal_split(
    text_parts, left, right, y, top_to_bottom, max_text_height=1 << 31
):
    """NextHorizontalSplit (tablerecog.cpp:1053-1082): walk text
    partitions away from ``y`` (bottom-up frame; ``top_to_bottom`` =
    toward smaller y) merging overlapping bands until the first clear
    horizontal gap; returns the split coordinate."""
    B = np.asarray([b for b, _mw in text_parts], dtype=np.int64).reshape(-1, 4)
    m = (B[:, 2] >= left) & (B[:, 0] <= right) & (
        B[:, 3] - B[:, 1] <= max_text_height)
    if top_to_bottom:
        m &= B[:, 1] <= y
        keys = -np.minimum(B[:, 3], y)
    else:
        m &= B[:, 3] >= y
        keys = np.maximum(B[:, 1], y)
    cands = [(int(k), b.tolist()) for k, b in zip(keys[m], B[m])]
    last_y = y
    for _e, box in sorted(cands, key=lambda c: c[0]):
        if top_to_bottom:
            if last_y >= y or last_y <= box[3]:
                last_y = min(last_y, box[1])
                continue
        else:
            if last_y <= y or last_y >= box[1]:
                last_y = max(last_y, box[3])
                continue
        return last_y
    return last_y


def recognize_whitespaced_table(text_parts, guess, min_height: int = 0):
    """RecognizeWhitespacedTable (tablerecog.cpp:908-1045): wobble the
    bottom border outward from the guess middle split-by-split, keeping
    a move when it improves the below-margin (header/footer shedding)
    or adds a multi-cell data row of sane height; then the same for the
    top border; finally refit on the best box.  Bottom-up frame."""
    table = TableStructure(text_parts, [])
    gl, gb, gr, gt = guess
    mid = (gb + gt) // 2
    best = [gl, gb, gr, gt]
    best_below = best_above = 0
    best_cols = 0
    found = False

    top = next_horizontal_split(text_parts, gl, gr, mid + min_height // 2, False)
    bottom = next_horizontal_split(
        text_parts, gl, gr, mid - min_height // 2, True
    )
    last_bottom = 1 << 31
    previous_below = 0
    chances = K_MAX_CHANCES
    while bottom != last_bottom:
        if top - bottom >= min_height:
            table.bounding_box = (gl, bottom, gr, top)
            if (
                table.find_whitespaced_structure()
                and table.column_count() >= best_cols * K_REQUIRED_COLUMNS
            ):
                chances = K_MAX_CHANCES
                max_row_h = K_MAX_ROW_SIZE * table.median_cell_height
                if (
                    table.space_below * K_MARGIN_FACTOR >= best_below
                    and table.space_below >= previous_below
                ) or (
                    table.count_filled_cells_in_row(0) > 1
                    and table.row_height(0) < max_row_h
                ):
                    best[1] = bottom
                    best_below = table.space_below
                    best_cols = max(table.column_count(), best_cols)
                    found = True
                previous_below = table.space_below
            else:
                chances -= 1
        if chances <= 0:
            break
        last_bottom = bottom
        bottom = next_horizontal_split(text_parts, gl, gr, last_bottom, True)
    if not found:
        return None

    found = False
    top = next_horizontal_split(text_parts, gl, gr, mid + min_height // 2, False)
    last_top = -(1 << 31)
    previous_above = 0
    chances = K_MAX_CHANCES
    while top != last_top:
        if top - best[1] >= min_height:
            table.bounding_box = (gl, best[1], gr, top)
            if (
                table.find_whitespaced_structure()
                and table.column_count() >= best_cols * K_REQUIRED_COLUMNS
            ):
                chances = K_MAX_CHANCES
                last_row = table.row_count() - 1
                max_row_h = K_MAX_ROW_SIZE * table.median_cell_height
                if (
                    table.space_above * K_MARGIN_FACTOR >= best_above
                    and table.space_above >= previous_above
                ) or (
                    table.count_filled_cells_in_row(last_row) > 1
                    and table.row_height(last_row) < max_row_h
                ):
                    best[3] = top
                    best_above = table.space_above
                    best_cols = max(table.column_count(), best_cols)
                    found = True
                previous_above = table.space_above
            else:
                chances -= 1
        if chances <= 0:
            break
        last_top = top
        top = next_horizontal_split(text_parts, gl, gr, last_top, False)
    if not found:
        return None

    table.bounding_box = tuple(best)
    return table if table.find_whitespaced_structure() else None


def recognize_table(text_parts, line_parts, guess):
    """RecognizeTable (:765-786): lined first, whitespace fallback."""
    table = recognize_lined_table(text_parts, line_parts, guess)
    if table is not None:
        return table
    return recognize_whitespaced_table(text_parts, guess)


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
