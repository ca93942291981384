"""Underline / overline separation and character restore.

Re-expresses the reference's three-part underline machinery over a binary
ink mask instead of blob lists:

- ``separate_underlines`` (src/textord/makerow.cpp:1771-1831): objects
  much wider than the text size whose horizontal projection is dominated
  by a flat band outside the x-height region leave the text stream.
- ``test_underline`` (src/textord/blkocc.cpp:47-103): the band test —
  the band's peak row must carry more than ``textord_underline_threshold``
  of the blob width AND more than twice the peak row of the x-height
  region (``desc_occ > x_occ + x_occ``); the mirrored top-band case is an
  overline.
- ``restore_underlined_blobs`` / ``find_underlined_blobs``
  (src/underlin.cpp:33-190): the character parts merged into an underline
  blob are found by the vertical projection of ink OUTSIDE the band
  (``middle_proj``) and chopped back out into the row; the residual bar
  stays out of the text.

The mask-level restore keeps band pixels only in columns where a stroke
enters the band from the character side (descenders crossing an
underline, ascenders crossing an overline keep their continuity), then
drops any far-side fragments left disconnected — the analogue of the
reference keeping chopped character cells and discarding residual
underline pieces.

Sloped bars: the reference's find_underlined_blobs fits a QUADRATIC
baseline under the blob (underlin.cpp:155-190 QSPLINE), so a bar on a
skewed page is separated as naturally as a flat one.  This pass runs
before the page deskew, so it gets the same power from a quantized
shear search (the page's own shear model, operators.page.SKEW_GRID):
when the flat-frame band test fails on a wide component, the component
is locally unsheared at the peak-projection slope and the band test,
erase and restore all run in that frame before shearing the edits back.

Divergence note: the reference runs this after row construction with the
row's fitted baseline; here it runs on the page mask before rows exist,
using each component's own projection structure in place of the baseline
split.  The fixture-font goldens pin that the results agree (text under
the bar decodes exactly).
"""

from __future__ import annotations

import numpy as np

from .linefind import seedfill

# textord_underline_threshold (blkocc.cpp:32): fraction of the blob width
# the band's peak row must occupy
UNDERLINE_THRESHOLD = 0.5
# textord_underline_width (makerow.cpp:83): the wide-object gate, as a
# multiple of the component's own height (the reference uses line_size,
# which a merged word+underline component's height approximates)
WIDE_MULT = 1.5
# a band thicker than this fraction of the component is the component
MAX_BAND_FRACTION = 0.4
# the bar's own rows run nearly the full component width; a dense glyph
# body row never does (kerning + word gaps cap it well below this)
FLAT_FRACTION = 0.9


def _band_runs(band: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, end) runs of True rows."""
    idx = np.flatnonzero(band)
    if len(idx) == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks] + 1, [idx[-1] + 1]))
    return list(zip(starts.tolist(), ends.tolist()))


def _restore_component(
    comp: np.ndarray, bt: int, be: int, overline: bool
) -> np.ndarray | None:
    """Erase the band rows [bt, be) of one merged component, keeping
    stroke continuity with the character side; drop far-side orphans.
    Returns the restored component mask, or None if nothing survives."""
    h, _w = comp.shape
    out = comp.copy()
    # stroke continuity: the row adjacent to the band on the CHARACTER
    # side defines which columns keep their band pixels (underlin.cpp's
    # chop cells are exactly the x-ranges with ink beyond the band)
    if overline:
        adj = out[be] if be < h else np.zeros(comp.shape[1], dtype=bool)
    else:
        adj = out[bt - 1] if bt > 0 else np.zeros(comp.shape[1], dtype=bool)
    out[bt:be] &= adj[None, :]
    # far-side residue (descender tips beyond an underline, ascender tips
    # beyond an overline) must stay connected through a kept band column;
    # orphans are residual underline, not text (underlin.cpp discards
    # them from the row)
    seed = np.zeros_like(out)
    if overline:
        seed[be:] = out[be:]
    else:
        seed[:bt] = out[:bt]
    if not seed.any():
        return None
    return seedfill(seed, out)


def _detect_band(comp: np.ndarray) -> tuple[str, int, int, bool] | None:
    """Run the band tests on one component mask.  Returns
    ``(kind, bt, be, overline)`` with kind ``'bar'`` (the component IS a
    free-standing bar) or ``'merged'`` (band rows [bt, be) of a merged
    bar+character component), or None.  ``comp`` may be a padded frame
    (the sloped retry's unsheared window) — positional gates use the ink
    extent, not the array height."""
    w = comp.shape[1]
    proj = comp.sum(axis=1)
    ink_rows = np.flatnonzero(proj)
    if ink_rows.size == 0:
        return None
    y0, hi = int(ink_rows[0]), int(ink_rows[-1]) + 1 - int(ink_rows[0])
    band = proj >= UNDERLINE_THRESHOLD * w
    runs = _band_runs(band)
    if not runs:
        return None
    # the pure-bar case: the whole component IS the band
    # (separate_underlines pulling a free-standing underline out of
    # the text stream; _grade_blobs only catches the page-wide ones)
    if all(band[proj > 0]):
        if hi <= 6 and w >= 8 * hi:
            return ("bar", y0, y0 + hi, False)
        return None
    # merged case: try the bottom-most run as an underline, the
    # top-most as an overline (test_underline checks both sides)
    for bt, be, overline in ((*runs[-1], False), (*runs[0], True)):
        if be - bt > MAX_BAND_FRACTION * hi:
            continue
        # trim the run to its flat near-full-width core: the bar rows
        # themselves.  Divergence note vs blkocc.cpp:99's pure 2x
        # occupancy ratio: a word whose every glyph carries a dense
        # body row projects ~the glyph-width sum at that row, and on
        # an all-descender line that inflates x_occ past the 2x gate;
        # the flatness requirement separates the bar (continuous
        # across gaps) from glyph rows (broken at kerning/word gaps).
        core = np.flatnonzero(proj[bt:be] >= FLAT_FRACTION * w)
        if core.size == 0:
            continue
        bt2, be2 = bt + int(core[0]), bt + int(core[-1]) + 1
        # positional gate: an underline band lives in the lower half
        # of the merged component, an overline in the upper half
        if overline and be2 - y0 > 0.5 * hi:
            continue
        if not overline and bt2 - y0 < 0.5 * hi:
            continue
        outside = proj.copy()
        outside[bt2:be2] = 0
        x_occ = int(outside.max())
        band_max = int(proj[bt2:be2].max())
        if band_max <= 1.5 * x_occ:  # blkocc.cpp:99, relaxed (above)
            continue
        # character ink must exist on the character side of the band
        char_rows = int((outside[be2:] > 0).sum()) if overline else int(
            (outside[:bt2] > 0).sum()
        )
        if char_rows < 2:
            continue
        return ("merged", bt2, be2, overline)
    return None


def _best_bar_slope(comp: np.ndarray, l: int) -> tuple[float, int]:
    """Quantized shear slope maximizing the peak row projection of the
    locally-unsheared component — a sloped bar flattens to ~full width
    at the page's true shear (the exact integer inverse of the render
    model, so the retry frame is as clean as a flat page's)."""
    from .page import SKEW_GRID

    ys, xs = np.nonzero(comp)
    xs_abs = xs + l

    def conc(rows: np.ndarray) -> int:
        # Σh² histogram concentration (estimate_skew's criterion): a bare
        # peak ties across neighbouring grid slopes once one row fills,
        # but only the true slope stacks EVERY bar row to full width
        h = np.bincount(rows - rows.min())
        return int((h.astype(np.int64) ** 2).sum())

    best_slope, best_score = 0.0, conc(ys)
    for slope in SKEW_GRID:
        if slope == 0.0:
            continue
        sh = -np.round(slope * xs_abs).astype(np.int64)
        score = conc(ys + sh)
        if score > best_score:
            best_slope, best_score = float(slope), score
    return best_slope, best_score


def separate_underlines_page(
    ink: np.ndarray,
    labels: np.ndarray,
    n: int,
    stats: np.ndarray,
    bars: list | None = None,
) -> int:
    """Find underline/overline bars merged with (or abutting) character
    ink and erase them from ``ink`` in place, restoring the characters.
    Returns the number of bars removed (0 = mask untouched).

    ``bars``: optional list the removed bars' page bboxes (l, t, r, b)
    are appended to — the source of the per-word ``underlined``
    attribute (WordFontAttributes is_underlined, which the reference
    itself leaves TODO-false, ltrresultiterator.cpp:175)."""
    n_found = 0
    for i in range(n):
        l, t, r, b = (int(v) for v in stats[i][:4])
        w, h = r - l, b - t
        if w < WIDE_MULT * h or w < 16 or h < 2:
            continue
        comp = labels[t:b, l:r] == i + 1
        hit = _detect_band(comp)
        sh = None  # per-column unshear shifts of the sloped retry
        if hit is None and w >= 48:
            # sloped-bar retry (underlin.cpp's QSPLINE fit handles sloped
            # bars natively; pre-deskew, the shear search is the analogue)
            slope, _peak = _best_bar_slope(comp, l)
            if slope != 0.0:
                sh = -np.round(slope * (l + np.arange(w))).astype(np.int64)
                sh -= sh.min()
                frame = np.zeros((h + int(sh.max()), w), dtype=bool)
                rows = np.arange(h)[:, None] + sh[None, :]
                cols = np.broadcast_to(np.arange(w), (h, w))
                frame[rows, cols] = comp
                hit = _detect_band(frame)
                if hit is not None:
                    comp_frame, frame_rows, frame_cols = frame, rows, cols
        if hit is None:
            continue
        kind, bt, be, overline = hit
        if kind == "bar":
            # decoration requires an ABUTTING text line: coverage of the
            # bar's width within the one-sided window above (underline)
            # or below (overline) — the linefind guard's semantics.  A
            # free bar at paragraph distance is a separator the line
            # finder missed (e.g. staircased on a still-sheared page);
            # leave it for blob grading's rule verdict instead of
            # silently eating the media (round-5 fuzz: a -0.055 page's
            # rule vanished here).
            win = 18
            above = ink[max(0, t - win) : t, l:r]
            below = ink[b : b + win, l:r]
            a_cov = bool(
                above.size and above.any(axis=0).sum() >= 0.35 * w
            )
            b_cov = bool(
                below.size and below.any(axis=0).sum() >= 0.35 * w
            )
            if not (a_cov or b_cov):
                continue
            ink[t:b, l:r] &= ~comp
            n_found += 1
            if bars is not None:
                bars.append((l, t, r, b))
            continue
        if w >= 48:
            # line-width bars: a small residual slope (in-frame or left
            # by the quantized local unshear) splits the 2 px bar across
            # up to 3 rows with partial widths (0.45-0.93 x w measured)
            # — the flat core alone leaves a part-row fused with the
            # glyphs (round-5 fuzz: scale-2 skewed underline read
            # 'w,x'), so widen the erase band to adjacent rows still
            # holding >= 0.35 of the width.  Glyph-sized components
            # (w < 48) keep the core-only erase: there an adjacent
            # half-width row is a glyph arm (a fused 'rn' pair's
            # connecting row reads ~0.55 x w and must survive for the
            # chop pass).
            body = comp if sh is None else comp_frame
            fproj = body.sum(axis=1)
            fw = body.shape[1]
            while bt > 0 and fproj[bt - 1] >= 0.35 * fw:
                bt -= 1
            while be < len(fproj) and fproj[be] >= 0.35 * fw:
                be += 1
        if sh is None:
            restored = _restore_component(comp, bt, be, overline)
        else:
            rest_frame = _restore_component(comp_frame, bt, be, overline)
            # shear the restored characters back into the page frame
            restored = (
                None
                if rest_frame is None
                else rest_frame[frame_rows, frame_cols]
            )
        ink[t:b, l:r] &= ~comp
        if restored is not None:
            ink[t:b, l:r] |= restored
        n_found += 1
        if bars is not None:
            if sh is None:
                bars.append((l, t + bt, r, t + be))
            else:
                bars.append(
                    (l, max(t, t + bt - int(sh.max())), r, min(b, t + be))
                )
    return n_found
