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


def _filter_specks(stats: np.ndarray) -> np.ndarray:
    """Drop 1-2 px specks before direction detection and column
    clustering — the vertical check runs on FILTERED blobs in the
    reference too (after filter_blobs); a few dust pixels must not
    spawn phantom columns or flip the flow-direction vote.  Glyph dots
    (i/j) are 4+ px and stay."""
    return stats[stats[:, 4] > 2]


def is_vertical_page(stats: np.ndarray) -> bool:
    """True when text flows vertically: glyphs pack tighter along y
    within x-band columns than along x within y-band rows — the
    direction test of the reference's vertical check
    (pagesegmain.cpp:272-413), expressed on box statistics.  Both
    clusterings must produce real runs (>= 3-glyph medians) to vote."""
    stats = _filter_specks(stats)
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


K_FP_TOLERANCE = 0.1  # kFPTolerance, cjkpitch.cpp:35


def cjk_pitch_cells(
    tops: np.ndarray,
    bottoms: np.ndarray,
    lefts: np.ndarray | None = None,
    rights: np.ndarray | None = None,
) -> tuple[float, list[list[int]]]:
    """Fixed-pitch cell assignment for one vertical column — the FPRow
    good-character pitch estimation (cjkpitch.cpp FPRow::Pass1Analyze
    :703-724 + EstimatePitch :615-684, axes swapped for vertical flow).

    A character is GOOD when its neighbour pitches agree within
    kFPTolerance and no participating box exceeds the pitch by more
    than the tolerance (is_good_pitch, cjkpitch.cpp:431-443); the row
    pitch is the median of pitches between good characters (pitches
    closer than half the 87.5%ile character height are same-cell
    fragments and ignored), falling back to the median of all pitches
    when fewer than two good ones exist — run once without an estimate
    and once against it (the analyzer's pass structure).  Components
    then snap to the pitch grid, merging multi-component glyphs that
    share a slot.  Returns (pitch, cells) with cells listing component
    indices in top-to-bottom order."""
    order = np.argsort(tops, kind="stable")
    t = tops[order].astype(np.float64)
    if len(t) < 2:
        return 0.0, [list(order)]
    b = bottoms[order].astype(np.float64)
    c = (t + b) / 2.0
    h = b - t  # flow-direction extent
    if lefts is not None and rights is not None:
        w = rights[order].astype(np.float64) - lefts[order].astype(np.float64)
    else:
        w = h
    height = float(np.percentile(h, 87.5))

    def is_good_pitch(p: float, i: int, j: int) -> bool:
        if p <= 0:
            return False
        lim = p * (1.0 + K_FP_TOLERANCE)
        if h[i] >= lim or h[j] >= lim or w[i] >= lim or w[j] >= lim:
            return False
        return abs((c[j] - c[i]) - p) < p * K_FP_TOLERANCE

    def estimate(good: np.ndarray, est: float) -> float:
        good_p: list[float] = []
        all_p: list[float] = []
        prev_good = bool(good[0])
        for i in range(1, len(c)):
            p = c[i] - c[i - 1]
            if p > height * 0.5:
                all_p.append(p)
                if good[i]:
                    if est <= 0.0 or (
                        prev_good and abs(est - p) < K_FP_TOLERANCE * est
                    ):
                        good_p.append(p)
                    prev_good = True
                else:
                    prev_good = False
        if not all_p:
            return 0.0
        if len(good_p) < 2:
            return float(np.median(all_p))
        return float(np.median(good_p))

    n = len(c)
    good = np.zeros(n, dtype=bool)
    for i in range(2, n):
        if is_good_pitch(c[i - 1] - c[i - 2], i - 1, i):
            good[i - 1] = True
    pitch = estimate(good, 0.0)
    if pitch > 0:
        good2 = np.zeros(n, dtype=bool)
        for i in range(2, n):
            if is_good_pitch(pitch, i - 2, i - 1) and is_good_pitch(
                pitch, i - 1, i
            ):
                good2[i - 1] = True
        if good2.any():
            pitch = estimate(good2, pitch) or pitch
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
    column (right-to-left).

    Separator rules are removed BEFORE the vertical check — the
    reference's SegmentPage order (FindLines precedes AutoPageSeg,
    pagesegmain.cpp:204-270): a full-height vertical rule between text
    columns is one page-tall component that corrupts the x/y-band
    clustering vote and flips the verdict.  Removed rules surface as
    media spans after the text columns.  find_and_remove_lines is
    lazily gated, so rule-less pages pay almost nothing extra."""
    from .linefind import find_and_remove_lines
    from .recognize import SubSpan, recognize_page

    ink = binarize_otsu(gray)
    if ink.any():
        # (find_and_remove_lines copies internally; on the horizontal
        # fallback recognize_page re-runs its own line pass — the double
        # cost is confined to the auto-OSD entry and the finder's lazy
        # gate keeps rule-less pages nearly free)
        clean, v_vecs, h_vecs, music = find_and_remove_lines(ink, dpi)
        n_rules = len(v_vecs) + len(h_vecs)
        base = clean if (n_rules or music is not None) else ink
        if base.any():
            _labels, _n, stats = label_and_stats(base)
            if is_vertical_page(stats):
                texts = recognize_vertical_page(gray, ink=base)
                spans = [
                    SubSpan("text", t, 100.0 if t else 0.0, 1, 1)
                    for t in texts
                ]
                spans += [
                    SubSpan("media", "", 0.0, 1, 1) for _ in range(n_rules)
                ]
                return spans, None
    return recognize_page(gray, dpi, dawg)


def recognize_vertical_page(
    gray: np.ndarray, ink: np.ndarray | None = None
) -> list[str]:
    """Decode a vertical page: columns right-to-left, each column's
    upright glyph cells re-laid into a horizontal strip and decoded by
    the template bank (greedy CTC; no spaces — CJK columns have none).

    ``ink``: optional pre-cleaned binary mask (the auto router passes
    its rule-removed mask so separators never reach the cell grid).

    Returns one text string per column in reading order."""
    net = get_net()
    if ink is None:
        ink = binarize_otsu(gray)
    if not ink.any():
        return []
    _labels, _n, stats = label_and_stats(ink)
    stats = _filter_specks(stats)
    cols = _cluster_columns(stats)
    # reading order: right-to-left by column center x
    cols.sort(key=lambda g: -float((stats[g, 0] + stats[g, 2]).mean() / 2))
    out: list[str] = []
    for g in cols:
        sub = stats[g]
        _pitch, cells = cjk_pitch_cells(
            sub[:, 1], sub[:, 3], sub[:, 0], sub[:, 2]
        )
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
