"""Vertical-text layout: detection + column recognition (CJK groundwork).

Re-expresses the reference's vertical handling:

- detection: ``Tesseract::SegmentPage`` checks whether the page's textlines
  read vertically before running the horizontal pipeline
  (src/ccmain/pagesegmain.cpp:272-413 vertical check) — here decided by
  comparing the transitive y-band (row) clustering against the x-band
  (column) clustering of blob boxes: upright glyphs stacked in columns
  produce long x-band runs and singleton y-bands;
- fixed-pitch column segmentation: CJK vertical text has no word spaces;
  glyph cells sit on a constant pitch grid and multi-component glyphs
  (dots, split strokes) merge into the cell whose grid slot they occupy
  (``src/textord/cjkpitch.cpp`` FPRow/FPChar semantics, simplified to the
  grid-snap that drives its segmentation);
- recognition: each vertical column re-lays its upright glyph cells into
  a horizontal strip (top-of-column = leftmost) and decodes through the
  standard template/CTC path — exactly how the reference rotates vertical
  ColPartitions into textline space while keeping glyphs upright;
- reading order: columns right-to-left (the CJK vertical convention the
  reference applies to vertical blocks).
"""

from __future__ import annotations

import numpy as np

from ..functions.fonts import CELL_H, KERN
from ..functions.image_ops import binarize_otsu, label_and_stats
from ..lstm.templates import get_net
from .page import _cluster_rows


def _cluster_columns(stats: np.ndarray) -> list[np.ndarray]:
    """x-band transitive clustering — _cluster_rows on swapped axes."""
    swapped = stats[:, [1, 0, 3, 2, 4]]
    return _cluster_rows(swapped)


def _flow_gap(stats: np.ndarray, groups: list[np.ndarray], axis: int) -> float:
    """Median gap between consecutive cluster members along the flow
    axis (axis 0 = x for rows, 1 = y for columns): text packs tightly
    along its reading direction."""
    gaps: list[float] = []
    lo_c, hi_c = (0, 2) if axis == 0 else (1, 3)
    for g in groups:
        if len(g) < 2:
            continue
        sub = stats[g]
        order = np.argsort(sub[:, lo_c], kind="stable")
        los = sub[order, lo_c]
        his = sub[order, hi_c]
        cov = float(his[0])
        for i in range(1, len(order)):
            gaps.append(float(los[i]) - cov)
            cov = max(cov, float(his[i]))
    return float(np.median(gaps)) if gaps else float("inf")


def is_vertical_page(stats: np.ndarray) -> bool:
    """True when text flows vertically: glyphs pack tighter along y
    within x-band columns than along x within y-band rows — the
    direction test of the reference's vertical check
    (pagesegmain.cpp:272-413), expressed on box statistics.  Both
    clusterings must produce real runs (>= 3-glyph medians) to vote."""
    if len(stats) < 4:
        return False
    rows = _cluster_rows(stats)
    cols = _cluster_columns(stats)
    med_col = float(np.median([len(g) for g in cols]))
    if med_col < 3.0:
        return False
    row_gap = _flow_gap(stats, rows, axis=0)
    col_gap = _flow_gap(stats, cols, axis=1)
    # a genuine flow direction has strictly sequential members (positive
    # gaps); overlap along an axis means side-by-side, not reading order
    return 0.0 <= col_gap < row_gap


def cjk_pitch_cells(
    tops: np.ndarray, bottoms: np.ndarray
) -> tuple[float, list[list[int]]]:
    """Fixed-pitch cell assignment for one vertical column.

    Estimates the glyph pitch from successive cell starts (compute_pitch,
    cjkpitch.cpp FPRow::EstimatePitch) and snaps every component to its
    grid slot, merging multi-component glyphs that share a slot.
    Returns (pitch, cells) with cells listing component indices in
    top-to-bottom order."""
    order = np.argsort(tops, kind="stable")
    t = tops[order].astype(np.float64)
    if len(t) < 2:
        return 0.0, [list(order)]
    gaps = np.diff(t)
    real = gaps[gaps > 2]  # ignore same-cell components (dot over body)
    pitch = float(np.median(real)) if len(real) else 0.0
    if pitch <= 0:
        return 0.0, [list(order)]
    cells: list[list[int]] = []
    cell_start = t[0]
    cur: list[int] = [int(order[0])]
    for i in range(1, len(t)):
        if t[i] - cell_start >= pitch / 2:
            cells.append(cur)
            cur = [int(order[i])]
            cell_start = t[i]
        else:
            cur.append(int(order[i]))
    cells.append(cur)
    return pitch, cells


def recognize_page_auto(gray: np.ndarray, dpi: int = 300, dawg=None):
    """PSM_AUTO_OSD-style entry: run the vertical check first
    (pagesegmain.cpp:272-413) and route to the vertical column reader or
    the standard horizontal pipeline.  Returns (spans, layout|None) in
    recognize_page's span shape; vertical pages emit one text span per
    column (right-to-left)."""
    from .recognize import SubSpan, recognize_page

    ink = binarize_otsu(gray)
    if ink.any():
        _labels, _n, stats = label_and_stats(ink)
        if is_vertical_page(stats):
            texts = recognize_vertical_page(gray)
            spans = [
                SubSpan("text", t, 100.0 if t else 0.0, 1, 1) for t in texts
            ]
            return spans, None
    return recognize_page(gray, dpi, dawg)


def recognize_vertical_page(gray: np.ndarray) -> list[str]:
    """Decode a vertical page: columns right-to-left, each column's
    upright glyph cells re-laid into a horizontal strip and decoded by
    the template bank (greedy CTC; no spaces — CJK columns have none).

    Returns one text string per column in reading order."""
    net = get_net()
    ink = binarize_otsu(gray)
    if not ink.any():
        return []
    _labels, _n, stats = label_and_stats(ink)
    cols = _cluster_columns(stats)
    # reading order: right-to-left by column center x
    cols.sort(key=lambda g: -float((stats[g, 0] + stats[g, 2]).mean() / 2))
    out: list[str] = []
    for g in cols:
        sub = stats[g]
        _pitch, cells = cjk_pitch_cells(sub[:, 1], sub[:, 3])
        # build the horizontal strip: cells left-to-right in top order
        crops: list[np.ndarray] = []
        for cell in cells:
            l = int(sub[cell, 0].min())
            t = int(sub[cell, 1].min())
            r = int(sub[cell, 2].max())
            b = int(sub[cell, 3].max())
            crops.append(ink[t:b, l:r])
        # classify each cell with a vertical-alignment search: the cell's
        # ink band inside its canonical 16-row frame is unknown (a
        # descender glyph vs an x-height glyph), so try every placement
        # and keep the best exact template match — the same hypothesis
        # search the horizontal path runs for baseline-ambiguous rows
        chars: list[str] = []
        for c in crops:
            if c.shape[0] > CELL_H:
                c = c[:CELL_H]
            best_frac, best_code = -1.0, -1
            for dy in range(CELL_H - c.shape[0] + 1):
                strip = np.zeros((CELL_H, c.shape[1] + KERN), dtype=bool)
                strip[dy : dy + c.shape[0], : c.shape[1]] = c
                _xs, fracs = net.match_scores(strip, cand_xs=np.array([0]))
                for w, (idxs, _f) in net.by_width.items():
                    fr = fracs[w]
                    if fr.size and float(fr.max()) > best_frac:
                        best_frac = float(fr.max())
                        best_code = int(idxs[int(fr[:, 0].argmax())])
            if best_code >= 0 and best_frac >= 0.9:
                chars.append(net.charset[best_code])
        out.append("".join(chars))
    return out
