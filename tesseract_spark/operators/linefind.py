"""Rule-line find/remove, halftone photo mask, and music-staff mask.

Numpy re-expression of the reference's morphological image operators that
run before connected-component analysis:

- ``LineFinder::FindAndRemoveLines`` (src/textord/linefind.cpp:674):
  morphological open with long thin bricks finds horizontal/vertical
  separator lines, false positives are filtered by stroke width /
  intersections / neighbouring non-line density, surviving lines are
  subtracted from the page together with their residue, and the text
  struck through by a rule is restored (its pixels never leave the page;
  only line pixels and unprotected residue are erased).
- ``ImageFind::FindImages`` (src/textord/imagefind.cpp:247): rank-binary
  reduction cascades find halftone regions (dense dot patterns that are
  thousands of tiny CCs at full resolution — invisible to blob grading).
- ``FilterMusic`` (src/textord/linefind.cpp:376): vertical bar lines with
  >=5 staff intersections seed a music mask that is lifted out of the
  page as a non-text region (pagesegmain.cpp:204-219 folds the music
  mask into the photo mask; we do the same).

All operators are pure numpy over one page's binary ink mask and live
inside the page-stage pandas UDF (no per-row Python at the Spark level).
Morphology is separable sliding-window cumsum — O(pixels) per brick, no
Python loops over pixels.  Boundary conditions match Leptonica's
asymmetric convention: erosion treats out-of-image as ON, dilation as OFF.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.image_ops import label_and_stats

# Constants from linefind.cpp:36-58 (same names, same values).
K_THIN_LINE_FRACTION = 20  # max line width = resolution / 20
K_MIN_LINE_LENGTH_FRACTION = 4  # min line length = resolution / 4
K_MIN_THICK_LINE_WIDTH = 12
K_MAX_LINE_RESIDUE = 6
K_THICK_LENGTH_MULTIPLE = 0.75
K_MAX_NON_LINE_DENSITY = 0.25
K_MAX_STAVE_HEIGHT = 1.0  # inches
K_MIN_MUSIC_PIXEL_FRACTION = 0.75
# Constants from imagefind.cpp:40-47.  kMinImageFindSize=100 is NOT
# ported: it guards a leptonica error path this numpy cascade doesn't
# have (see find_images).


@dataclass
class LineVector:
    """One found separator line (frozen TabVector analogue,
    linefind.cpp:608-618: vectors are built from the line-mask CC boxes)."""

    kind: str  # 'h' | 'v'
    bbox: tuple[int, int, int, int]  # l, t, r, b (top-down, half-open)


# ---------------------------------------------------------------------------
# separable binary morphology (cumsum sliding windows)


def _shift(m: np.ndarray, s: int, axis: int, fill: bool) -> np.ndarray:
    """y[i] = m[i+s] along axis (s may be negative); out-of-image = fill.

    empty_like + one strip assignment instead of full_like: the fill
    covers only the |s| out-of-image rows/cols, not the whole array —
    full_like's redundant whole-array write showed up as ~4% of the
    per-page profile at flagship call rates."""
    if s == 0:
        return m
    out = np.empty_like(m)
    if axis == 0:
        if s > 0:
            out[:-s, :] = m[s:, :]
            out[-s:, :] = fill
        else:
            out[-s:, :] = m[:s, :]
            out[:-s, :] = fill
    else:
        if s > 0:
            out[:, :-s] = m[:, s:]
            out[:, -s:] = fill
        else:
            out[:, -s:] = m[:, :s]
            out[:, :-s] = fill
    return out


def _run_reduce(m: np.ndarray, k: int, axis: int, erode: bool) -> np.ndarray:
    """Start-anchored erosion (AND) / dilation (OR) over a k-window via
    logarithmic shift-doubling: E_{a+b}[i] = E_a[i] op E_b[i+a].
    O(log k) boolean passes — the van-Herk analogue for numpy."""
    fill = erode  # erosion: out-of-image = ON; dilation: OFF
    out = m
    op = np.logical_and if erode else np.logical_or
    span = 1
    while span < k:
        step = min(span, k - span)
        shifted = _shift(out, step, axis, fill)
        # combine INTO the freshly-allocated shift buffer: one alloc +
        # one pass fewer per doubling round (out may alias the caller's
        # array on round 1; shifted never does)
        out = op(out, shifted, out=shifted)
        span += step
    return out


def _windowed(m: np.ndarray, k: int, axis: int, erode: bool) -> np.ndarray:
    """Centered erosion/dilation: head-pad by the window's left reach so the
    anchored reduce lands centered, then slice back to the input size.
    (Direct allocation instead of np.pad — this runs several times per
    page and np.pad's generic machinery dominates at fixture sizes.)"""
    before = k // 2 if erode else k - 1 - k // 2  # reflected SEL for dilate
    if before:
        shape = list(m.shape)
        shape[axis] += before
        # empty + pad-strip fill, not np.full: the full-array prefill is
        # immediately overwritten by the copy for all but `before` lanes
        p = np.empty(shape, dtype=m.dtype)
        if axis == 0:
            p[:before, :] = erode
            p[before:, :] = m
        else:
            p[:, :before] = erode
            p[:, before:] = m
    else:
        p = m
    out = _run_reduce(p, k, axis, erode)
    return out[: m.shape[0], :] if axis == 0 else out[:, : m.shape[1]]


def _window_all(m: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Erosion along one axis with window k (out-of-image = ON).

    Shift-doubling on purpose: a run-scan alternative (diff +
    flatnonzero + interval paint) was A/B'd and loses at flagship page
    sizes (~230x400 px), where numpy per-call overhead dominates the
    O(log k) tiny-array boolean passes; it only breaks even on large
    dense pages, which the grid-bucketed layout path already bounds."""
    if k <= 1:
        return m
    return _windowed(m, k, axis, True)


def _window_any(m: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Dilation along one axis with window k (out-of-image = OFF)."""
    if k <= 1:
        return m
    return _windowed(m, k, axis, False)


def erode_brick(m: np.ndarray, hsize: int, vsize: int) -> np.ndarray:
    """pixErodeBrick(hsize, vsize) — Leptonica argument order.

    (A bbox-cropped variant was A/B'd and REVERTED: at flagship mask
    sizes the per-call bbox scan + full-size paste, ~35us, cancels the
    ~50% area saving — the crop only pays on sparse masks, which the
    label-side crop in image_ops already covers.)"""
    return _window_all(_window_all(m, hsize, 1), vsize, 0)


def dilate_brick(m: np.ndarray, hsize: int, vsize: int) -> np.ndarray:
    return _window_any(_window_any(m, hsize, 1), vsize, 0)


def open_brick(m: np.ndarray, hsize: int, vsize: int) -> np.ndarray:
    return dilate_brick(erode_brick(m, hsize, vsize), hsize, vsize)


def close_brick(m: np.ndarray, hsize: int, vsize: int) -> np.ndarray:
    return erode_brick(dilate_brick(m, hsize, vsize), hsize, vsize)


def seedfill(seed: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """pixSeedfillBinary (8-conn): components of ``mask`` touching ``seed``."""
    if not seed.any() or not mask.any():
        return np.zeros_like(mask)
    labels, n, _stats = label_and_stats(mask)
    touched = np.unique(labels[seed & mask])
    lut = np.zeros(n + 1, dtype=bool)
    lut[touched] = True
    lut[0] = False
    return lut[labels]


def _max_stroke_width(comp: np.ndarray, cap: int = 8) -> int:
    """MaxStrokeWidth (linefind.cpp:112-131): 2x the max of the 4-conn
    distance function — counted here as erosion rounds to extinction,
    capped (we only compare against kMinThickLineWidth)."""
    m = comp
    rounds = 0
    while m.any() and rounds < cap:
        # one 4-connected erosion, boundary = background
        inner = m.copy()
        inner[1:, :] &= m[:-1, :]
        inner[:-1, :] &= m[1:, :]
        inner[:, 1:] &= m[:, :-1]
        inner[:, :-1] &= m[:, 1:]
        inner[0, :] = inner[-1, :] = False
        inner[:, 0] = inner[:, -1] = False
        m = inner
        rounds += 1
    return rounds * 2


def _touching_intersections(
    bbox: tuple[int, int, int, int], inter_stats: np.ndarray
) -> int:
    """NumTouchingIntersections (linefind.cpp:133-146): intersection CCs
    overlapping the line box."""
    if inter_stats is None or len(inter_stats) == 0:
        return 0
    l, t, r, b = bbox
    il, it, ir, ib = (
        inter_stats[:, 0],
        inter_stats[:, 1],
        inter_stats[:, 2],
        inter_stats[:, 3],
    )
    return int(((il < r) & (ir > l) & (it < b) & (ib > t)).sum())


def _adjacent_nonline_count(
    line_width: int, bbox: tuple[int, int, int, int], nonline: np.ndarray
) -> int:
    """CountPixelsAdjacentToLine (linefind.cpp:148-172): black pixels in the
    box grown by the line width along its smaller dimension."""
    l, t, r, b = bbox
    h, w = nonline.shape
    if (r - l) > (b - t):  # horizontal line: grow vertically
        t2, b2 = max(0, t - line_width), min(h, b + line_width)
        return int(nonline[t2:b2, l:r].sum())
    l2, r2 = max(0, l - line_width), min(w, r + line_width)
    return int(nonline[t:b, l2:r2].sum())


def _filter_false_positives(
    resolution: int,
    nonline: np.ndarray,
    inter_stats: np.ndarray | None,
    line_pix: np.ndarray,
    protect: np.ndarray | None = None,
    raw_nonline: np.ndarray | None = None,
) -> int:
    """FilterFalsePositives (linefind.cpp:183-224).  Erases bad components
    from line_pix in place; returns the number remaining.

    ``protect``: ink known a-priori to be text (the shiro-rekha
    splitter's split-word mask) — a candidate whose pixels mostly fall
    on protected ink is text, however line-like its closed shape.

    ``raw_nonline``: the UNERODED non-line ink, used only by the
    underline guard's extent-hug measurement — the residue-eroded
    ``nonline`` drops <6-row glyph stubs the candidate itself chopped,
    truncating the covering ink's apparent extent (round-5 fuzz: a
    scale-1 underline under 'discotheques' lost its right half there
    and flipped to the separator path).  Coverage/mass tests keep the
    eroded mask (reference fidelity, CountPixelsAdjacentToLine)."""
    min_thick_length = int(resolution * K_THICK_LENGTH_MULTIPLE)
    labels, n, stats = label_and_stats(line_pix)
    remaining = n
    for i in range(n):
        l, t, r, b, _a = (int(v) for v in stats[i])
        bw, bh = r - l, b - t
        comp = (labels[t:b, l:r] == i + 1)
        if protect is not None:
            on_ink = comp & (nonline[t:b, l:r] | protect[t:b, l:r])
            if (
                on_ink.any()
                and (protect[t:b, l:r] & on_ink).sum() >= 0.5 * on_ink.sum()
            ):
                line_pix[t:b, l:r] &= ~comp
                remaining -= 1
                continue
        max_width = _max_stroke_width(comp)
        bad = (
            bw >= K_MIN_THICK_LINE_WIDTH
            and bh >= K_MIN_THICK_LINE_WIDTH
            and bw < min_thick_length
            and bh < min_thick_length
            and max_width > K_MIN_THICK_LINE_WIDTH
        )
        if not bad and _touching_intersections((l, t, r, b), inter_stats) < 2:
            nonline_count = _adjacent_nonline_count(
                max_width, (l, t, r, b), nonline
            )
            if nonline_count > bh * bw * K_MAX_NON_LINE_DENSITY:
                bad = True  # underline / shirorekha-like: embedded in text
            elif bw > 2 * bh and bh > 8:
                # THICK wide candidates (photo closures, fused masses)
                # keep the round-4 guard verbatim: whole-window coverage
                # against the ext-span bar, strict one-sided XOR.  The
                # per-column/own-width refinements below are calibrated
                # for the thin-bar regime and changed a pinned thick
                # case's verdict when applied here.
                win = max(18, 3 * bh)
                ext = max(4 * bh, resolution // 10)
                xl, xr = max(0, l - ext), min(nonline.shape[1], r + ext)
                span = xr - xl
                above = nonline[max(0, t - win) : t, xl:xr]
                below = nonline[b : b + win, xl:xr]
                above_cov = bool(
                    above.size and above.any(axis=0).sum() >= 0.35 * span
                )
                below_cov = bool(
                    below.size and below.any(axis=0).sum() >= 0.35 * span
                )
                if above_cov != below_cov:
                    side = above if above_cov else below
                    cols = np.flatnonzero(side.any(axis=0))
                    ink_l, ink_r = xl + int(cols[0]), xl + int(cols[-1]) + 1
                    slop = max(8, resolution // 10)
                    if l >= ink_l - slop and r <= ink_r + slop:
                        bad = True
            elif bw > 2 * bh:
                # underline guard (linefind.cpp:207-213 'perhaps ...
                # underlines'): an h candidate flush under a text line —
                # text ink directly above covering most of its x-range —
                # is an underline; it stays in the ink for the
                # separate_underlines pass (operators/underline.py), not
                # the separator path.  A rule wedged into a form box
                # bypasses this via the >=2-intersections branch above.
                # 0.35: text over an underline covers ~40-60% of its
                # columns within the window (kerning + word gaps); a
                # paragraph separator has none within ~1mm at 300dpi.
                # The mirrored below-check protects overlines.
                #
                # The x-window extends ~1mm past the candidate: the
                # hollow-mask extraction SEGMENTS a bar that text
                # crosses (descenders fuse bar+glyph into the solid
                # mask), and a surviving word-gap segment has no text
                # over its OWN x-range — the neighbouring words' ink
                # identifies it.  The test is one-sided (XOR): an
                # underline/overline has text on exactly one side,
                # a strike-through rule (line_removal golden) has text
                # on BOTH sides and must stay on the separator path.
                # window reach 18 (was 12): a large-scale line's glyphs
                # only dip their bottom strokes into a 12-row window
                # and an abutting underline's coverage fell just under
                # the 0.35 bar (round-4 underline axis, scale-3 page);
                # 18 still stays inside the paragraph gap (>= 26 px at
                # the smallest scale), so separators between paragraphs
                # remain uncovered on both sides
                # coverage window 18 (round-4 value): widening to 24 was
                # tried for the no-descender scale-3 underline (its
                # ink-above coverage starts at depth ~21) and REVERTED —
                # it traded three pinned separator contracts (a rule near
                # a photo edge and the clipped-glyph rule both sit in the
                # 19-24 band).  That single residual class (underline on
                # a descender-free line at the largest render scale) is
                # documented in the fuzzer help.
                win = max(18, 3 * bh)
                ext = max(4 * bh, resolution // 10)
                xl, xr = max(0, l - ext), min(nonline.shape[1], r + ext)
                ncols = xr - xl
                # coverage bar: 0.35 x the candidate's OWN width, counted
                # over the ext-extended window columns.  The window still
                # extends ~1mm past the candidate (a word-gap SEGMENT of a
                # text-crossed bar has no text over its own x-range — the
                # neighbouring words' ink identifies it), but the bar no
                # longer counts the extension's margin columns in its
                # denominator: a full-ink-width scale-3 underline's
                # baseline-band coverage sat one column under the old
                # ext-span bar (round-5 fuzz).
                cov_bar = 0.35 * bw
                # probe depth > coverage window: 'covered' keeps the
                # reference's one-sided window (win), but the gap-
                # asymmetry arbitration below needs the far side's TRUE
                # depth — at scale >= 2 the next line's coverage starts
                # right at the window edge and a win-truncated reading
                # compressed every gap to ~18, erasing the asymmetry
                probe = max(54, 2 * win + 4)
                # depths measured PER COLUMN from the candidate's own
                # top/bottom profile, not its bbox rows: a staircased bar
                # on a still-sheared page spans several bbox rows, and
                # bbox-frame windows smear both sides' distances by the
                # full shear rise (round-5 fuzz: a 0.025-slope page read
                # (8, 9) where the flat truth is (10, 13)).  Per-column
                # measurement is shear-invariant; ext columns without
                # candidate ink fall back to the bbox rows (<= 1 px off
                # at separator-legal slopes over the ~1mm extension).
                cmask = labels[t:b, l:r] == i + 1
                top_of = np.full(ncols, t, dtype=np.int64)
                bot_of = np.full(ncols, b, dtype=np.int64)
                has = cmask.any(axis=0)
                ch = b - t
                first = np.argmax(cmask, axis=0)
                last = ch - 1 - np.argmax(cmask[::-1], axis=0)
                sel = np.zeros(ncols, dtype=bool)
                sel[l - xl : r - xl] = has
                top_of[sel] = t + first[has]
                bot_of[sel] = t + last[has] + 1
                cols_idx = np.arange(xl, xr)
                depths = np.arange(1, probe + 1)

                raw = raw_nonline if raw_nonline is not None else nonline

                def _cov_dist(edge: np.ndarray, sign: int, src=None):
                    """(depth, win_cols, win_mass): smallest per-column
                    depth at which column coverage reaches the bar (None
                    if never within probe), each column's any-ink-within-
                    win flag, and the within-win ink count.  Depth d
                    probes row edge + sign*d per column of ``src``
                    (default: the RAW non-line ink — the residue erosion
                    eats the <6-row glyph tops the candidate itself
                    chopped, and a long word's whole above-coverage
                    vanished with them; the density pre-pass keeps the
                    eroded mask, which IS the reference's
                    CountPixelsAdjacentToLine input)."""
                    if src is None:
                        src = raw
                    rows_at = edge[None, :] + sign * depths[:, None]
                    valid = (rows_at >= 0) & (rows_at < src.shape[0])
                    # ext columns: a STAIRCASED bar's continuation beyond
                    # this candidate's own run lives in the raw mask
                    # around the band rows (the bar drifts |slope|*ext
                    # <= 2 px past its own band across the ~1mm window,
                    # on top of the band height) and read as abutting
                    # "text" on both sides (round-5 fuzz: a -0.035
                    # scale-1 underline's last plateau saw its own left
                    # remnant at depth 1).  Probes in columns without
                    # candidate ink skip the band +-4 rows; genuine
                    # covering glyphs extend far beyond them.
                    valid &= sel[None, :] | (
                        (rows_at < t - 4) | (rows_at >= b + 4)
                    )
                    vals = np.zeros((probe, ncols), dtype=bool)
                    vv = valid.ravel()
                    vals.ravel()[vv] = src[
                        rows_at.ravel()[vv],
                        np.broadcast_to(cols_idx, (probe, ncols)).ravel()[vv],
                    ]
                    reach = np.maximum.accumulate(vals, axis=0)
                    counts = reach.sum(axis=1)
                    hit = np.flatnonzero(counts >= cov_bar)
                    d = int(hit[0]) + 1 if len(hit) else None
                    return d, reach[win - 1], int(vals[:win].sum())

                def _extent_cols(side_above: bool) -> np.ndarray:
                    # extent-hug span from the RAW ink (see docstring)
                    if side_above:
                        return _cov_dist(top_of, -1, src=raw)[1]
                    return _cov_dist(bot_of - 1, +1, src=raw)[1]

                d_above, above_cols, mass_above = _cov_dist(top_of, -1)
                d_below, below_cols, mass_below = _cov_dist(bot_of - 1, +1)
                above_cov = d_above is not None and d_above <= win
                below_cov = d_below is not None and d_below <= win
                if above_cov and below_cov:
                    # gap-asymmetry arbitration (the round-4 KNOWN OPEN):
                    # a 2 px underline under a line with the NEXT line an
                    # interline gap below covers BOTH sides of the one-
                    # sided test and read as a separator.  Measured
                    # envelope (300 dpi, own-width bar, probe window):
                    # underlines read (near, far) = (5,10)/(5,12)/(6,13)
                    # at scale 1 and (12,18+)/(15,26+) on deskew-retry
                    # copies at scales 2-3 — the near side is the
                    # abutting descender band (<= 4s + residue slack),
                    # the far side a full interline gap away.  A strike-
                    # through rule not already on the >=2-intersections
                    # bypass reads ~(1,1), and a between-paragraph
                    # separator is not both-covered at all (its nearest
                    # ink sits beyond the coverage window).  Underline
                    # iff near <= 16 (descender band at the largest
                    # render scale) and far >= near + 3 (a staircased
                    # scale-2 bar reads (9, 12) — each side loses ~1 px
                    # to the transition rows; the nearest competing
                    # contract, equal gaps, reads a difference of 0-1).
                    d_near = min(d_above, d_below)
                    d_far = max(d_above, d_below)
                    text_cols = None
                    if d_near <= 16 and d_far >= d_near + 3:
                        text_cols = _extent_cols(d_above <= d_below)
                    elif min(mass_above, mass_below) <= 0.5 * max(
                        mass_above, mass_below
                    ):
                        # tail fallback: a bar struck through the
                        # DESCENDER BAND of its own line (the
                        # underline_stats golden, makerow.cpp:1771
                        # regime) has ink at depth ~1 on both sides —
                        # but the far side is only the severed tails,
                        # carrying a fraction of the text side's mass;
                        # a true both-sided separator (two full lines)
                        # is near mass parity.  The bar hugs the HEAVY
                        # (text) side.
                        text_cols = _extent_cols(mass_above >= mass_below)
                    if text_cols is not None:
                        cols = np.flatnonzero(text_cols)
                        ink_l = xl + int(cols[0])
                        ink_r = xl + int(cols[-1]) + 1
                        slop = max(8, resolution // 10)
                        if l >= ink_l - slop and r <= ink_r + slop:
                            bad = True
                elif above_cov != below_cov:
                    # extent check before the underline verdict: an
                    # underline hugs its text's x-extent, while a
                    # section separator under a SHORT line extends far
                    # past it (found by the round-4 fuzzer: a column
                    # rule below a two-word line read as that line's
                    # underline and vanished from the separator path).
                    # Keep the underline verdict only when the bar does
                    # not outrun the covering ink's extent by more than
                    # ~1mm at 300dpi on either side.
                    cols = np.flatnonzero(_extent_cols(above_cov))
                    ink_l, ink_r = xl + int(cols[0]), xl + int(cols[-1]) + 1
                    slop = max(8, resolution // 10)
                    if l >= ink_l - slop and r <= ink_r + slop:
                        bad = True
        if bad:
            line_pix[t:b, l:r] &= ~comp
            remaining -= 1
    return remaining


def _subtract_lines_and_residue(
    src: np.ndarray, line_pix: np.ndarray, nonline: np.ndarray
) -> None:
    """SubtractLinesAndResidue (linefind.cpp:93-110), in place on src:
    remove the line, then remove small unprotected fragments touching it
    (protected = components in the non-line mask, i.e. real text)."""
    src &= ~line_pix
    residue = src & ~nonline
    fat = dilate_brick(line_pix, 3, 3)
    src &= ~seedfill(fat, residue)


def _filter_music(
    resolution: int,
    pix_closed: np.ndarray,
    vline: np.ndarray,
    hline: np.ndarray,
) -> np.ndarray | None:
    """FilterMusic (linefind.cpp:376-441): vertical bars with >=5 staff
    joins in sufficient density seed the music mask; the mask grows to the
    whole touching component and is density-verified per CC."""
    max_stave_height = int(resolution * K_MAX_STAVE_HEIGHT)
    inter = vline & hline
    if not inter.any():
        return None
    _ilab, _in, inter_stats = label_and_stats(inter)
    vlab, vn, vstats = label_and_stats(vline)
    music = None
    for i in range(vn):
        l, t, r, b, _a = (int(v) for v in vstats[i])
        joins = _touching_intersections((l, t, r, b), inter_stats)
        # join density >= 5 per max_stave_height (linefind.cpp:391-393)
        if joins >= 5 and (joins - 1) * max_stave_height >= 4 * (b - t):
            if music is None:
                music = np.zeros_like(vline)
            music[t:b, l:r] = True
    if music is None:
        return None
    music = seedfill(music, pix_closed)
    # density check per music CC (linefind.cpp:408-428)
    _mlab, mn, mstats = label_and_stats(music)
    for i in range(mn):
        l, t, r, b, area = (int(v) for v in mstats[i])
        all_pixels = int(pix_closed[t:b, l:r].sum())
        if area < K_MIN_MUSIC_PIXEL_FRACTION * all_pixels:
            music[t:b, l:r] = False
    if not music.any():
        return None
    vline &= ~music
    hline &= ~music
    return music


def _vectors_of(
    line_pix: np.ndarray, kind: str, ink: np.ndarray | None = None
) -> list[LineVector]:
    """Remaining line-mask CCs -> frozen line vectors, with collinear
    segments merged into one logical separator (the reference builds
    TabVectors from the same boxes then merges them,
    TabVector::MergeSimilarTabVectors at linefind.cpp:614,650 — a rule
    broken by dense ink crossings is still ONE rule).

    Two collinear segments merge only when the gap between them is
    CROSSED by ink (the striking glyph that broke the rule, the pixels
    SubtractLinesAndResidue later restores): an EMPTY gap means two
    separate separators — e.g. the per-column rules of a two-column
    page must not fuse across the gutter.  The gap must also hold no
    OTHER collinear separator: on a three-column page whose per-column
    rules share one y, the middle rule's own ink would otherwise pass
    the bridging test and chain the outer rules into one page-wide
    separator (found by the round-4 three-column fuzzer).  Segments are
    processed in along-the-line order so every segment that could sit
    in a candidate gap is already in the merged list when the gap is
    tested."""
    _lab, n, stats = label_and_stats(line_pix)
    segs = [
        [int(l), int(t), int(r), int(b)] for l, t, r, b, _a in stats[:n]
    ]
    lo, hi = (1, 3) if kind == "h" else (0, 2)  # cross-direction interval
    al, ah = (0, 2) if kind == "h" else (1, 3)  # along-direction interval
    segs.sort(key=lambda s: (s[al], s[lo], s[ah]))
    merged: list[list[int]] = []
    for s in segs:
        for m in merged:
            if not (s[lo] < m[hi] and s[hi] > m[lo]):
                continue  # not collinear
            g0, g1 = min(m[ah], s[ah]), max(m[al], s[al])
            gap_ok = g1 <= g0  # overlapping/abutting along the line
            if not gap_ok and ink is not None:
                blocked = any(
                    o is not m
                    and s[lo] < o[hi] and s[hi] > o[lo]
                    and o[al] < g1 and o[ah] > g0
                    for o in merged
                )
                if not blocked:
                    # EVERY gap column must carry band ink: a struck rule
                    # is still continuous ink under the striking glyph
                    # (the mask gap comes from the solid-blob subtraction,
                    # not from missing rule pixels), whereas a text row
                    # that merely crosses the band in the gutter leaves
                    # word-gap and margin columns empty — .any() let such
                    # rows chain per-column rules across the page (found
                    # by the round-4 three-column fuzzer)
                    b0, b1 = min(m[lo], s[lo]), max(m[hi], s[hi])
                    if kind == "h":
                        gap_ok = bool(
                            ink[b0:b1, g0:g1].any(axis=0).all()
                        )
                    else:
                        gap_ok = bool(
                            ink[g0:g1, b0:b1].any(axis=1).all()
                        )
            elif not gap_ok:
                gap_ok = True  # no ink supplied: legacy permissive merge
            if gap_ok:
                m[0], m[1] = min(m[0], s[0]), min(m[1], s[1])
                m[2], m[3] = max(m[2], s[2]), max(m[3], s[3])
                break
        else:
            merged.append(list(s))
    # tight-clip each vector to the INK inside its box: the
    # erode+dilate length restoration can overshoot the bar's true
    # extent by a pixel, and a bbox touching a neighbouring photo's
    # rect then fuses with it downstream while the golden's tight
    # rects stay separate (round-4 fuzzer, rule 1 px shy of a photo)
    if ink is not None:
        for m in merged:
            sub = ink[m[1] : m[3], m[0] : m[2]]
            if not sub.any():
                continue
            rows = np.flatnonzero(sub.any(axis=1))
            cols = np.flatnonzero(sub.any(axis=0))
            m[0], m[2] = m[0] + int(cols[0]), m[0] + int(cols[-1]) + 1
            m[1], m[3] = m[1] + int(rows[0]), m[1] + int(rows[-1]) + 1
    return [LineVector(kind=kind, bbox=tuple(m)) for m in merged]


def find_and_remove_lines(
    ink: np.ndarray,
    resolution: int = 300,
    music: bool = True,
    protect: np.ndarray | None = None,
    pix_dil: np.ndarray | None = None,
    gate1_known: bool = False,
) -> tuple[np.ndarray, list[LineVector], list[LineVector], np.ndarray | None]:
    """FindAndRemoveLines (linefind.cpp:674-755) over a binary ink mask.

    Returns (clean_ink, v_vectors, h_vectors, music_mask).  clean_ink is a
    new array with separator lines, their residue, crossing joins, and any
    detected music subtracted; text that a rule strikes through stays.
    """
    src = ink.copy()
    max_line_width = max(1, resolution // K_THIN_LINE_FRACTION)
    min_line_length = max(2, resolution // K_MIN_LINE_LENGTH_FRACTION)
    closing_brick = max(1, max_line_width // 3)

    # GetLineMasks (linefind.cpp:456-585), lazily: the common page has no
    # line candidates at all, so gate before any labeling work.  Cheapest
    # first: pix_closed ⊆ pix_dilated, so a min_line_length run in the
    # closed mask needs one in the dilated mask — test THAT and skip the
    # close's erosion half entirely on the common clean text page.
    if pix_dil is None:
        pix_dil = dilate_brick(src, closing_brick, closing_brick)
    # ``pix_dil``: the deskew-retry caller already built the dilated mask
    # (its pre-gate) — reuse it instead of recomputing (exact; page.py
    # computes the identical brick from the same dpi).  ``gate1_known``
    # is accepted for that caller's contract but no longer changes the
    # flow: a dilated-mask pre-gate was measured NET-NEGATIVE here (half
    # the flagship pages pass it and then pay the closed-mask gate too),
    # so the first early-exit decision is taken on pix_closed directly —
    # pix_closed ⊆ pix_dilated, so every early return this gate takes,
    # the old two-stage gate took as well: exact.
    del gate1_known
    pix_closed = erode_brick(pix_dil, closing_brick, closing_brick)
    # pix_hollow ⊆ pix_closed, so a min_line_length run in the hollow mask
    # needs one in the closed mask first — gate on that before paying for
    # the (much wider) solid open on every remaining text page
    if (
        not erode_brick(pix_closed, 1, min_line_length).any()
        and not erode_brick(pix_closed, min_line_length, 1).any()
    ):
        return src, [], [], None
    pix_solid = open_brick(pix_closed, max_line_width, max_line_width)
    pix_hollow = pix_closed & ~pix_solid
    ev = erode_brick(pix_hollow, 1, min_line_length)
    eh = erode_brick(pix_hollow, min_line_length, 1)
    v_empty, h_empty = not ev.any(), not eh.any()
    if v_empty and h_empty:
        return src, [], [], None
    vline = dilate_brick(ev, 1, min_line_length) if not v_empty else ev
    hline = dilate_brick(eh, min_line_length, 1) if not h_empty else eh

    music_mask = None
    if music and not v_empty and not h_empty:
        music_mask = _filter_music(resolution, pix_closed, vline, hline)
        v_empty, h_empty = not vline.any(), not hline.any()

    # Cheap false-positive pre-pass: kill candidates that are obviously
    # text (boundary bands of closed words) by the same density predicate
    # but counted against raw non-candidate ink — avoids building the
    # eroded+seedfilled non-line masks on every text page.  Survivors get
    # the faithful FilterFalsePositives below.
    inter_stats0 = None
    if not v_empty and not h_empty:
        _i0, _n0, inter_stats0 = label_and_stats(vline & hline)
    for line_pix in (vline, hline):
        if not line_pix.any():
            continue
        other = hline if line_pix is vline else vline
        labels, n, stats = label_and_stats(line_pix)
        for i in range(n):
            l, t, r, b, _a = (int(v) for v in stats[i])
            if _touching_intersections((l, t, r, b), inter_stats0) >= 2:
                continue
            width = min(b - t, r - l, 8)
            gl, gt = max(0, l - width), max(0, t - width)
            gr, gb = min(src.shape[1], r + width), min(src.shape[0], b + width)
            if (r - l) > (b - t):
                gl, gr = l, r  # grow only the smaller dimension
            else:
                gt, gb = t, b
            nonline_count = (
                int(src[gt:gb, gl:gr].sum())
                - int(line_pix[gt:gb, gl:gr].sum())
                - int(other[gt:gb, gl:gr].sum())
            )
            if nonline_count > (b - t) * (r - l) * K_MAX_NON_LINE_DENSITY:
                line_pix[t:b, l:r] &= ~(labels[t:b, l:r] == i + 1)
    v_empty, h_empty = not vline.any(), not hline.any()
    if v_empty and h_empty:
        if music_mask is not None:
            src &= ~music_mask
        return src, [], [], music_mask

    inter = None
    inter_stats = None
    non_vline = None
    non_hline = None
    if not v_empty:
        nonlines = src & ~vline
        if not h_empty:
            nonlines &= ~hline
            inter = vline & hline
            _il, _inn, inter_stats = label_and_stats(inter)
        non_vline = erode_brick(nonlines, K_MAX_LINE_RESIDUE, 1)
        non_vline = seedfill(non_vline, nonlines)
        if not h_empty:
            non_vline = (non_vline | hline) & ~(inter if inter is not None else False)
        if _filter_false_positives(
            resolution, non_vline, inter_stats, vline, protect,
            raw_nonline=nonlines,
        ) == 0:
            v_empty = True
    else:
        nonlines = src & ~hline if not h_empty else None
    if not h_empty:
        non_hline = erode_brick(nonlines, 1, K_MAX_LINE_RESIDUE)
        non_hline = seedfill(non_hline, nonlines)
        if not v_empty:
            non_hline |= vline & ~(inter if inter is not None else False)
        if _filter_false_positives(
            resolution, non_hline, inter_stats, hline, protect,
            raw_nonline=nonlines,
        ) == 0:
            h_empty = True

    # FindAndRemoveVLines / FindAndRemoveHLines (linefind.cpp:588-661)
    v_vectors: list[LineVector] = []
    h_vectors: list[LineVector] = []
    if not v_empty:
        v_vectors = _vectors_of(vline, "v", ink=src)
        _subtract_lines_and_residue(src, vline, non_vline)
    if not h_empty:
        h_vectors = _vectors_of(hline, "h", ink=src)
        _subtract_lines_and_residue(src, hline, non_hline)
    if not v_empty and not h_empty:
        # remove crossing-join residue on RECOMPUTED intersections —
        # "Recalculate the intersections, since some lines have been
        # deleted" (linefind.cpp:712-721); the false-positive filters
        # above intentionally used the pre-filter intersections, as the
        # reference's FindAndRemoveHLines does (:702)
        join = dilate_brick(vline & hline, 5, 5)
        src &= ~seedfill(join, src)
    if music_mask is not None:
        src &= ~music_mask
    return src, v_vectors, h_vectors, music_mask


# ---------------------------------------------------------------------------
# halftone / photo mask (imagefind.cpp:247-330)


def _reduce_rank2(m: np.ndarray, rank: int) -> np.ndarray:
    """pixReduceRankBinary 2x: output pixel ON if its 2x2 block has at
    least ``rank`` ON pixels (rank 1 = OR, 4 = AND)."""
    h, w = m.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    if (ph, pw) != (h, w):
        p = np.zeros((ph, pw), dtype=m.dtype)  # direct alloc (np.pad's
        p[:h, :w] = m  # generic machinery costs at per-page call rates)
        m = p
    # the 2x2 block corners as four strided views; rank thresholds reduce
    # to pure boolean algebra (no int accumulation pass)
    a, b = m[0::2, 0::2], m[0::2, 1::2]
    c, d = m[1::2, 0::2], m[1::2, 1::2]
    if rank == 1:
        return a | b | c | d
    if rank == 4:
        return a & b & c & d
    ab, cd = a & b, c & d
    if rank == 3:
        return (ab & (c | d)) | (cd & (a | b))
    # rank == 2: at least one pair ON
    return ab | cd | ((a | b) & (c | d))


def _cascade(m: np.ndarray, ranks: list[int]) -> np.ndarray:
    for r in ranks:
        m = _reduce_rank2(m, r)
    return m


def _expand2(m: np.ndarray, times: int, shape: tuple[int, int]) -> np.ndarray:
    """pixExpandReplicate by 2**times, cropped/padded to target shape."""
    for _ in range(times):
        m = np.repeat(np.repeat(m, 2, axis=0), 2, axis=1)
    h, w = shape
    out = np.zeros(shape, dtype=bool)
    out[: min(h, m.shape[0]), : min(w, m.shape[1])] = m[:h, :w]
    return out


def find_images(ink: np.ndarray) -> np.ndarray:
    """FindImages (imagefind.cpp:247-330): halftone photo mask.

    Rank-binary cascades: an OR 2x reduce solidifies dense dot patterns,
    then AND-heavy reduces kill text (strokes have background nearby at
    every scale) while halftone regions survive.  The surviving seed grows
    back over the dot region via seedfill, and a fine-mask AND (the
    reference's line/bar remover) trims thin connected appendages.
    Returns a full-resolution boolean mask (all-False when no image found).
    """
    h, w = ink.shape
    # Documented divergence from the reference's kMinImageFindSize=100
    # guard (imagefind.cpp:250-255): that bound exists only because
    # leptonica's pixGenHalftoneMask errors below 100px on the reduced
    # image — an implementation limit, not semantics.  This cascade is
    # plain numpy and only needs the 16x reduction to be non-degenerate,
    # so small pages keep their halftone detection (a photo on a page
    # too narrow for the reference guard otherwise reaches the row
    # builder and decodes as an empty garbage line).
    if w // 2 < 16 or h // 2 < 16:
        return np.zeros_like(ink)
    pixr = _reduce_rank2(ink, 1)  # 2x OR reduce
    # halftone mask analogue of pixGenerateHalftoneMask: a small closing
    # first (leptonica pixCloseSafeBrick inside pixGenerateHalftoneMask,
    # called at imagefind.cpp:264) solidifies periodic dot fields whose
    # dots collapse to single pixels under an aligned OR reduce — without
    # it a grid-aligned halftone reduces to a 1px checkerboard that the
    # rank-4 seed cascade annihilates; then seed = high-rank cascade
    # (solid areas only), mask = softer cascade, seed grows in mask
    pixr = close_brick(pixr, 2, 2)
    # seed cascade with early exit: once a rank reduce empties, the rest
    # stay empty and the page has no halftone — the common text page
    # stops at its first all-AND reduce
    seed = pixr
    for r in (4, 4, 3):
        seed = _reduce_rank2(seed, r)
        if not seed.any():
            return np.zeros_like(ink)
    mask4 = dilate_brick(_cascade(pixr, [4, 2]), 3, 3)  # 8x of full
    ht8 = seedfill(_expand2(seed, 1, mask4.shape), mask4)
    if not ht8.any():
        return np.zeros_like(ink)
    pixht = _expand2(ht8, 3, ink.shape)
    # capture pixels near the mask edges that were missed
    # (imagefind.cpp:292-295)
    pixht |= seedfill(pixht, ink)
    # eliminate lines and bars joined to the image (imagefind.cpp:297-321,
    # fine-mask branch; the coarse 128x branch is skipped — at fixture page
    # sizes it reduces below 1px, documented simplification)
    fine = dilate_brick(_cascade(pixht, [1, 1, 3, 3]), 5, 5)  # 16x
    pixht &= _expand2(fine, 4, ink.shape)
    if not pixht.any():
        return pixht
    # ink components actually touching the halftone SEED — the dense dot
    # field itself, before the block-aligned mask growth.  _reclaim_text
    # scores these (and retains mask only over them), so a mask window
    # that overreached into a neighbouring text row returns that text to
    # the pipeline instead of dragging the whole window's verdict down
    # (the reference's partition-level filtering, imagefind.cpp:1106-1180)
    core = seedfill(_expand2(seed, 4, ink.shape), ink)
    return _reclaim_text(pixht, ink, core)


def _reclaim_text(
    pixht: np.ndarray, ink: np.ndarray, core: np.ndarray | None = None
) -> np.ndarray:
    """Reclaim text wrongly caught by the mask: the reference
    re-examines image partitions and returns text-like ones to the text
    pipeline (ImageFind partition filtering, imagefind.cpp:1106-1180;
    blob-size reasoning as in ccnontextdetect.cpp).  At full resolution
    a genuine image region is either a halftone (many tiny dot CCs) or
    mostly solid ink; a text region is a handful of glyph-sized
    components.  Where the size stats are ambiguous — glyphs as small
    as halftone dots — the textline PROJECTION arbitrates
    (EvaluateColPartition via operators/projection.py): text rows band
    the projection and their boxes score strongly-in-textline, a dot
    field floods it uniformly and scores ~zero."""
    from .projection import construct_projection, strongly_in_textline_fraction

    _mlab, mn, mstats = label_and_stats(pixht)
    for i in range(mn):
        l, t, r, b, _a = (int(v) for v in mstats[i])
        wl, wt, wr, wb = l, t, r, b  # full mask window (for erasure)
        win = ink[t:b, l:r]
        if core is not None and core[t:b, l:r].any():
            # prefer the seed-touching components: text rows swallowed by
            # the block-aligned mask growth are excluded from the verdict
            # and returned to the text pipeline below
            win = core[t:b, l:r]
        if not win.any():
            pixht[t:b, l:r] = False
            continue
        # rule-shaped components never belong to an image verdict: the
        # block-aligned seed expansion can pull a nearby separator into
        # the window's core (a rule 2 px beside a photo), gluing it into
        # the retained bbox and costing the page a separator region
        # (round-4 fuzzer, inverted photo+rule column).  Strip them from
        # the window before the tight bbox; back in the ink they reach
        # the rule path of blob grading.  A rule physically crossing a
        # photo is connected to it — one big component, never filtered.
        _wlab, wn, wstats = label_and_stats(win)
        if wn > 1:
            wcw = wstats[:wn, 2] - wstats[:wn, 0]
            wch = wstats[:wn, 3] - wstats[:wn, 1]
            rule_like = ((wcw >= 8 * wch) & (wch <= 4)) | (
                (wch >= 8 * wcw) & (wcw <= 4)
            )
            if rule_like.any() and not rule_like.all():
                win = win.copy()
                for ri in np.flatnonzero(rule_like):
                    rl_, rt_, rr_, rb_ = (int(v) for v in wstats[ri][:4])
                    win[rt_:rb_, rl_:rr_] &= _wlab[rt_:rb_, rl_:rr_] != ri + 1
                if not win.any():
                    pixht[wt:wb, wl:wr] = False
                    continue
        # evaluate over the tight ink bbox, not the 8x-block-aligned mask
        # window — the reference scores ColPartitions on their BLOB
        # bounding boxes (imagefind.cpp:1106-1180), and the block-aligned
        # window dilutes a genuine image's solidity below any threshold
        ys, xs = np.nonzero(win.any(axis=1)), np.nonzero(win.any(axis=0))
        t, b = t + int(ys[0][0]), t + int(ys[0][-1]) + 1
        l, r = l + int(xs[0][0]), l + int(xs[0][-1]) + 1
        _clab, cn, cstats = label_and_stats(ink[t:b, l:r])
        if cn == 0:
            pixht[t:b, l:r] = False
            continue
        areas = cstats[:cn, 4]
        is_halftone = cn >= 30 and float(np.median(areas)) <= 16.0
        # the solid path needs an absolute size floor: with the tight
        # bbox a dense glyph pair also reads "solid", but a genuine
        # image region is several glyphs big (the same 1200 px² gate as
        # _grade_blobs' relative photo test; strike-through residue over
        # one word must fall back to the text pipeline)
        is_solid = (
            float(areas.max()) >= 0.5 * (r - l) * (b - t)
            and (r - l) * (b - t) >= 1200
            and min(r - l, b - t) >= 20
        )
        if not (is_halftone or is_solid) and cn > 1:
            # a block-aligned mask window can fuse SEVERAL images (two
            # photos stacked within one 8x block column) — the union
            # bbox then fails the solidity test even though every
            # member is a solid image.  Score each component on its own
            # bbox and retain the qualifying ones (the reference's
            # partition filtering is likewise per-ColPartition,
            # imagefind.cpp:1106-1180; found by the round-4 fuzzer: two
            # stacked photos in one column both vanished and the
            # smaller re-entered the text pipeline as a phantom row)
            kept_any = False
            pixht[wt:wb, wl:wr] = False
            for j in range(cn):
                cl, ct, cr, cb, ca = (int(v) for v in cstats[j])
                cw, ch = cr - cl, cb - ct
                if (
                    ca >= 0.5 * cw * ch
                    and cw * ch >= 1200
                    and min(cw, ch) >= 20
                ):
                    pixht[t + ct : t + cb, l + cl : l + cr] = True
                    kept_any = True
            if kept_any:
                continue
        if is_halftone and not is_solid:
            # the projection veto: a "halftone" whose components sit in
            # textline bands is a dense small-glyph paragraph.  A real
            # 300-dpi halftone carries tens of thousands of dot CCs —
            # the fraction estimate doesn't need them all, so the vote
            # runs over a deterministic stride sample (the projection
            # itself still builds from every box: one vectorized
            # increment per component, cheap; the per-box gradient
            # walk is the Python-loop part being bounded)
            proj = construct_projection(cstats[:cn], (b - t, r - l))
            sample = cstats[: cn : max(1, cn // 512)]
            if strongly_in_textline_fraction(proj, sample) >= 0.5:
                is_halftone = False
        if not (is_halftone or is_solid):
            pixht[wt:wb, wl:wr] = False
        elif (t, b, l, r) != (wt, wb, wl, wr):
            # keep the image but only over its tight bbox — any text the
            # block-aligned window swallowed goes back to the pipeline
            pixht[wt:wb, wl:wr] = False
            pixht[t:b, l:r] = True
    return pixht
