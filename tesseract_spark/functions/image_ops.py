"""Pixel-level operators: binarization + connected components (pure numpy).

These are the vectorized bodies of the page-stage pandas UDFs.  Semantics
follow the reference:

- Otsu global threshold: ``src/ccstruct/otsuthr.cpp:35-157`` (``OtsuThreshold``
  / ``HistogramRect`` / ``OtsuStats``) — 256-bin histogram, maximize
  between-class variance; applied per rectangle in
  ``src/ccmain/thresholder.cpp:378-419``.
- Adaptive tiled Otsu: ``src/ccmain/thresholder.cpp:247-274``
  (Leptonica ``pixOtsuAdaptiveThreshold``; tile size from
  ``thresholding_tile_size`` × dpi, min 16).
- Sauvola: ``src/ccmain/thresholder.cpp:210-246`` — ``t = m·(1+k·(s/128−1))``.
- Connected components: the reference chain-codes outlines
  (``src/textord/edgblob.cpp:347``, ``scanedg.cpp:61``); we use an equivalent
  vectorized run-graph labeling (searchsorted adjacency + min-label
  propagation), which yields identical 4/8-connected components without
  the chain-code detour.
- Stroke width: distance-transform stats per blob
  (``src/textord/tordmain.cpp:60-152`` ``SetBlobStrokeWidth``) — approximated
  with horizontal/vertical run-length medians, which is what the reference's
  h/v stroke measures converge to on axis-aligned glyphs.
"""

from __future__ import annotations

import numpy as np


def otsu_threshold(img: np.ndarray) -> int:
    """Global Otsu threshold for a uint8 image.

    Returns t such that foreground (ink) is ``img <= t`` for dark-on-light
    pages.  Mirrors OtsuStats (otsuthr.cpp:127-157): maximize
    omega0*omega1*(mu0-mu1)^2 over split points.
    """
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 127
    levels = np.arange(256, dtype=np.float64)
    w0 = np.cumsum(hist)
    w1 = total - w0
    m0 = np.cumsum(hist * levels)
    mu_total = m0[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mean0 = m0 / w0
        mean1 = (mu_total - m0) / w1
    var_between = w0 * w1 * (mean0 - mean1) ** 2
    var_between = np.nan_to_num(var_between, nan=-1.0)
    return int(np.argmax(var_between))


def binarize_otsu(img: np.ndarray) -> np.ndarray:
    """Binary ink mask (True = ink) via global Otsu with polarity detection.

    The reference picks per-channel hi/lo polarity (otsuthr.cpp:60-106); we
    detect inverted (white-on-black) pages by comparing mean intensities of
    the two classes against the border, like the auto-invert retry in
    lstmrecognizer.cpp:349-377 but resolved up front.
    """
    t = otsu_threshold(img)
    dark = img <= t
    # Border pixels are background with overwhelming probability.
    border = np.concatenate([img[0], img[-1], img[:, 0], img[:, -1]])
    border_dark = (border <= t).mean()
    if border_dark > 0.5:  # dark background => ink is the light class
        return ~dark
    return dark


def binarize_adaptive_otsu(img: np.ndarray, tile: int = 64) -> np.ndarray:
    """Tiled Otsu with a smoothed threshold surface (thresholder.cpp:247-274).

    Computes a per-tile Otsu threshold, box-filters the threshold map
    (3x3 tile neighborhood), bilinearly holds it per tile, then thresholds.
    """
    h, w = img.shape
    tile = max(16, int(tile))
    th = max(1, (h + tile - 1) // tile)
    tw = max(1, (w + tile - 1) // tile)
    tmap = np.zeros((th, tw), dtype=np.float64)
    for ty in range(th):
        for tx in range(tw):
            block = img[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            tmap[ty, tx] = otsu_threshold(block)
    # 3x3 mean smoothing of the threshold surface.
    padded = np.pad(tmap, 1, mode="edge")
    sm = sum(
        padded[dy : dy + th, dx : dx + tw] for dy in range(3) for dx in range(3)
    ) / 9.0
    full = np.repeat(np.repeat(sm, tile, axis=0), tile, axis=1)[:h, :w]
    return img <= full


def binarize_sauvola(img: np.ndarray, window: int = 25, k: float = 0.35) -> np.ndarray:
    """Sauvola local threshold via integral images (thresholder.cpp:210-246).

    t(x,y) = m(x,y) * (1 + k * (s(x,y)/128 - 1)); window >= 7 per reference.
    """
    window = max(7, int(window)) | 1
    h, w = img.shape
    f = img.astype(np.float64)
    pad = window // 2
    fp = np.pad(f, pad, mode="reflect")
    fp2 = fp * fp
    # summed-area tables
    s1 = np.cumsum(np.cumsum(fp, axis=0), axis=1)
    s2 = np.cumsum(np.cumsum(fp2, axis=0), axis=1)
    s1 = np.pad(s1, ((1, 0), (1, 0)))
    s2 = np.pad(s2, ((1, 0), (1, 0)))

    def box(s):
        return (
            s[window:, window:]
            - s[:-window, window:]
            - s[window:, :-window]
            + s[:-window, :-window]
        )

    n = window * window
    mean = box(s1)[:h, :w] / n
    var = box(s2)[:h, :w] / n - mean * mean
    std = np.sqrt(np.maximum(var, 0.0))
    t = mean * (1.0 + k * (std / 128.0 - 1.0))
    return f[:h, :w] <= t


def label_and_stats(mask: np.ndarray, connectivity: int = 8):
    """Connected components + per-component stats in one pass.

    Returns (labels, n, stats) where stats rows are
    (left, top, right, bottom, area) computed from the row runs collected
    during labeling — no separate full-image pixel pass (the np.nonzero
    route costs ~16 bytes of traffic per ink pixel; runs are ~100x fewer).
    """
    return _label_vectorized(mask, connectivity)


def label_components(mask: np.ndarray, connectivity: int = 8):
    """Run-based connected-component labeling, fully vectorized.

    Equivalent output to the reference's outline tracer
    (edgblob.cpp:347 extract_edges -> C_BLOBs) for solid glyphs.
    Returns (labels [H,W] with 0=background, n_components).
    """
    labels, n, _stats = _label_vectorized(mask, connectivity)
    return labels, n


def _label_vectorized(mask: np.ndarray, connectivity: int = 8):
    """Bbox-cropping front end for :func:`_label_core`.

    Flagship pages are ~45% margin; labeling is a fixed number of passes
    over the full raster, so cropping to the ink bbox nearly halves it.
    EXACT: components are strictly local, and scan-order numbering is
    preserved because cropping removes only empty rows/columns (the
    (row, start) order of runs is invariant under a uniform shift)."""
    h, w = mask.shape
    ry = np.flatnonzero(mask.any(axis=1))
    if len(ry) == 0:
        return (
            np.zeros((h, w), dtype=np.int16),
            0,
            np.zeros((0, 5), dtype=np.int64),
        )
    cx = np.flatnonzero(mask.any(axis=0))
    t, b = int(ry[0]), int(ry[-1]) + 1
    l, r = int(cx[0]), int(cx[-1]) + 1
    if (b - t) * (r - l) >= 0.9 * h * w:
        return _label_core(mask, connectivity)
    sub, n, stats = _label_core(mask[t:b, l:r], connectivity)
    labels = np.zeros((h, w), dtype=sub.dtype)
    labels[t:b, l:r] = sub
    stats[:, 0] += l
    stats[:, 2] += l
    stats[:, 1] += t
    stats[:, 3] += t
    return labels, n, stats


def _label_core(mask: np.ndarray, connectivity: int = 8):
    """Vectorized run-graph labeling: extract all row runs in one numpy
    pass, find run-adjacency edges with searchsorted, resolve components
    by min-label propagation with pointer jumping (no per-pixel or
    per-run Python in the hot loops).

    Component ids are numbered by first appearance in scan order
    (top-down, left-right) — identical to the sequential two-pass
    union-find this replaces, so golden CC tests are unchanged.
    """
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int16)  # widened below if n > int16
    # pad one background column so runs cannot span row boundaries
    m = np.zeros((h, w + 1), dtype=bool)
    m[:, :w] = mask
    flat = m.ravel()
    d = np.diff(flat.view(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if flat[0]:
        starts = np.concatenate(([0], starts))
    R = len(starts)
    if R == 0:
        return labels, 0, np.zeros((0, 5), dtype=np.int64)
    stride = w + 1
    ys = starts // stride
    s = starts - ys * stride
    e = ends - ys * stride
    pad = 1 if connectivity == 8 else 0
    # adjacency with the previous row: run i overlaps prev-row run j iff
    # s_j < e_i + pad and e_j + pad > s_i; runs are globally sorted by
    # (row, start), so two searchsorteds over row-keyed coordinates give
    # each run's candidate range, clamped to the previous row's block
    W = w + 2  # row key stride; fits any coordinate in [0, w+1]
    key_s = ys.astype(np.int64) * W + s
    key_e = ys.astype(np.int64) * W + e
    row_blocks = np.searchsorted(ys, np.arange(h + 1))
    prev_y = np.maximum(ys - 1, 0)
    lo = np.searchsorted(key_e, prev_y * W + np.maximum(s - pad, 0), side="right")
    hi = np.searchsorted(key_s, prev_y * W + np.minimum(e + pad, W - 1), side="left")
    blk_lo = row_blocks[prev_y]
    blk_hi = row_blocks[ys]  # first run of own row = end of prev row block
    lo = np.clip(lo, blk_lo, blk_hi)
    hi = np.clip(hi, blk_lo, blk_hi)
    cnt = np.where(ys > 0, np.maximum(hi - lo, 0), 0)
    E = int(cnt.sum())
    lbl = np.arange(R, dtype=np.int64)
    if E:
        ei = np.repeat(np.arange(R), cnt)
        off = np.repeat(np.cumsum(cnt) - cnt, cnt)
        ej = np.repeat(lo, cnt) + np.arange(E) - off
        # chain pre-contraction: glyph bodies are mostly vertical STACKS of
        # runs (each run's sole prev-row neighbour has it as its sole
        # next-row neighbour).  Those 1-1 edges form a functional forest
        # whose roots resolve with O(log chain) pointer-doubling gathers —
        # far cheaper than dragging the min label one step per round
        # through the edge loop below.  Only junction edges (branches,
        # loop closures) remain for the loop, so it converges in a couple
        # of rounds instead of ~10 on ordinary text pages.
        ncnt = np.bincount(ej, minlength=R)
        chain = (cnt[ei] == 1) & (ncnt[ej] == 1)
        parent = np.arange(R, dtype=np.int64)
        parent[ei[chain]] = ej[chain]  # each such i appears exactly once
        while True:
            p2 = parent[parent]
            if np.array_equal(p2, parent):
                break
            parent = p2
        lbl = parent
        rest = ~chain
        ei2 = parent[ei[rest]]
        ej2 = parent[ej[rest]]
        keep_e = ei2 != ej2
        ei2 = ei2[keep_e]
        ej2 = ej2[keep_e]
        # min-label propagation + pointer jumping until fixed point
        while ei2.size:
            mn = np.minimum(lbl[ei2], lbl[ej2])
            new = lbl.copy()
            np.minimum.at(new, ei2, mn)
            np.minimum.at(new, ej2, mn)
            new = new[new]
            if np.array_equal(new, lbl):
                break
            lbl = new
    # number components by first appearance (ascending root run index)
    roots, comp0 = np.unique(lbl, return_inverse=True)
    n = len(roots)
    # label dtype: int16 covers ordinary pages; a speck-storm page can
    # exceed 32767 components, which would silently WRAP and attribute
    # pixels to wrong components downstream — widen to int32 when needed
    lab_dtype = np.int16 if n < np.iinfo(np.int16).max else np.int32
    comp = (comp0 + 1).astype(lab_dtype)
    # paint labels: scatter run extents into the flat image
    lens = e - s
    total = int(lens.sum())
    pos = np.repeat(starts, lens) + (
        np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    )
    lab_flat = np.zeros(h * stride, dtype=lab_dtype)
    lab_flat[pos] = np.repeat(comp, lens)
    labels = lab_flat.reshape(h, stride)[:, :w]
    # per-component stats from runs
    stats = np.zeros((n, 5), dtype=np.int64)
    cid = comp0
    stats[:, 0] = w
    stats[:, 1] = h
    np.minimum.at(stats[:, 0], cid, s)
    np.minimum.at(stats[:, 1], cid, ys)
    np.maximum.at(stats[:, 2], cid, e)
    np.maximum.at(stats[:, 3], cid, ys + 1)
    np.add.at(stats[:, 4], cid, lens)
    return labels, n, stats


def component_stats(labels: np.ndarray, n: int) -> np.ndarray:
    """Per-component bbox + area: rows of (left, top, right, bottom, area).

    bbox is half-open [left,right) x [top,bottom) in top-down image coords;
    callers convert to the reference's bottom-up TBOX convention at the edges
    (SURVEY §1.1, thresholder.cpp:140-152).
    """
    out = np.zeros((n, 5), dtype=np.int64)
    if n == 0:
        return out
    ys, xs = np.nonzero(labels)
    labs = labels[ys, xs] - 1
    out[:, 0] = np.full(n, labels.shape[1])
    out[:, 1] = np.full(n, labels.shape[0])
    np.minimum.at(out[:, 0], labs, xs)
    np.minimum.at(out[:, 1], labs, ys)
    np.maximum.at(out[:, 2], labs, xs)
    np.maximum.at(out[:, 3], labs, ys)
    out[:, 2] += 1
    out[:, 3] += 1
    np.add.at(out[:, 4], labs, 1)
    return out


def stroke_widths(mask: np.ndarray, labels: np.ndarray, n: int):
    """Median horizontal/vertical ink run length per component.

    Stands in for SetBlobStrokeWidth's distance-transform local-maxima stats
    (tordmain.cpp:60-152): for axis-aligned strokes both reduce to the run
    length across the stroke.  Returns (h_width[n], v_width[n]) float arrays.
    """
    h_runs: list[list[int]] = [[] for _ in range(n)]
    v_runs: list[list[int]] = [[] for _ in range(n)]

    def scan(arr2d, lab2d, sink):
        rows, cols = arr2d.shape
        for y in range(rows):
            row = arr2d[y]
            if not row.any():
                continue
            d = np.diff(row.astype(np.int8))
            starts = list(np.flatnonzero(d == 1) + 1)
            ends = list(np.flatnonzero(d == -1) + 1)
            if row[0]:
                starts.insert(0, 0)
            if row[-1]:
                ends.append(cols)
            for s, e in zip(starts, ends):
                sink[lab2d[y, s] - 1].append(e - s)

    scan(mask, labels, h_runs)
    scan(mask.T, labels.T, v_runs)
    hw = np.array([float(np.median(r)) if r else 0.0 for r in h_runs])
    vw = np.array([float(np.median(r)) if r else 0.0 for r in v_runs])
    return hw, vw
