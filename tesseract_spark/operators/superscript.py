"""Sub/superscript correction pass (src/ccmain/superscript.cpp).

The reference's ``SubAndSuperscriptFix`` (superscript.cpp:106-227) runs in
recognition pass 2: words whose leading/trailing blobs are y-position
outliers — blob bottom above ``super_y_bottom = baseline +
superscript_min_y_bottom * x_height`` or blob top below ``sub_y_top =
baseline + subscript_max_y_top * x_height`` (GetSubAndSuperscriptCandidates,
superscript.cpp:258-343) — and badly classified get those blobs split off
(``TrySuperscriptSplits``, :369-483), re-recognized with y-position
penalties off, and pasted back with per-blob ``SP_SUPERSCRIPT`` /
``SP_SUBSCRIPT`` flags when the result is believable
(``BelievableSuperscript``, :503-589: no punctuation, each char at least
``superscript_bettered_certainty`` as certain as before, no char smaller
than ``superscript_scaledown_ratio`` of its normal height).

Re-expressed for this engine's split layout/recognition stages:

- layout time (``find_script_segments``, called from page.analyze_page):
  classify each row's merged glyph boxes against the same two y
  thresholds, keep maximal same-position runs sitting at a word's leading
  or trailing edge whose OWN re-metered render scale is smaller than the
  row's (the geometric analogue of "badly classified at row scale" — a
  scaled-down glyph cannot match the row-scale templates), re-normalize
  the run to its own baseline/scale into a canonical strip (the
  "y-position penalties off" re-recognition frame, :404-440), and erase
  the run's columns from the main row strip (split_word's chop);
- recognition time (``decode_script_segments``, called from
  recognize._decode_row): decode each run strip with the template net and
  accept per BelievableSuperscript — non-empty, punctuation-free, height
  ratio >= superscript_scaledown_ratio, confidence >=
  superscript_bettered_certainty x the adjacent word's — then paste the
  text back into the adjacent word with a script-position flag
  (join_words + SetAllScriptPositions, :469-476).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# reference defaults (src/ccmain/tesseractclass.cpp:308-333)
SUPERSCRIPT_MIN_Y_BOTTOM = 0.3  # tesseractclass.cpp:331
SUBSCRIPT_MAX_Y_TOP = 0.5  # tesseractclass.cpp:326
SUPERSCRIPT_SCALEDOWN_RATIO = 0.4  # tesseractclass.cpp:321
SUPERSCRIPT_BETTERED_CERTAINTY = 0.97  # tesseractclass.cpp:315

_PUNCT = set(".,;:!?'\"()-")


@dataclass
class ScriptSeg:
    """One leading/trailing y-outlier run split off a word for
    re-recognition in its own baseline frame."""

    pos: str  # 'super' | 'sub'
    side: str  # 'lead' | 'trail'
    word_idx: int  # index into the row's (layout) word_boxes
    strip: np.ndarray  # canonical 16-row strip, run's own baseline/scale
    bbox: tuple[int, int, int, int]  # page coords of the run
    height_ratio: float  # run x-height / row x-height


def find_script_segments(
    bstats: np.ndarray,
    gidx: np.ndarray,
    baseline_y: int,
    x_height: int,
    scale: int,
    word_boxes: list[tuple[int, int, int, int]],
    text_mask: np.ndarray,
) -> tuple[list[ScriptSeg], list[tuple[int, int, int, int]]]:
    """Detect sub/superscript candidate runs on one row.

    Returns (segments, revised word boxes).  Word boxes covering a run
    shrink to their normal-glyph extent (split_word chops the outlier
    blobs out of the WERD); the caller erases each segment's columns from
    the row strip.
    """
    from .page import _descale_strip, _merge_x_overlap_boxes, _row_metrics

    if not word_boxes:
        return [], word_boxes
    gboxes = _merge_x_overlap_boxes(bstats, gidx)
    order = np.argsort(gboxes[:, 0], kind="stable")
    gboxes = gboxes[order]
    # y-outlier classification (GetSubAndSuperscriptCandidates y rule,
    # superscript.cpp:259-283, image coords: y grows downward)
    super_min_raise = SUPERSCRIPT_MIN_Y_BOTTOM * x_height
    sub_max_rise = SUBSCRIPT_MAX_Y_TOP * x_height
    gt, gb = gboxes[:, 1], gboxes[:, 3]
    is_sup = (baseline_y - gb) >= super_min_raise
    is_sub = (~is_sup) & ((baseline_y - gt) <= sub_max_rise) & (gb > baseline_y)
    if not (is_sup.any() or is_sub.any()):  # the common row: no outliers
        return [], word_boxes
    pos_of = [
        "super" if s else ("sub" if u else "")
        for s, u in zip(is_sup.tolist(), is_sub.tolist())
    ]

    # glyph -> word assignment (word boxes partition the row's x extent)
    def word_of(gl: int, gr: int) -> int:
        for wi, (wl, _t, wr, _b) in enumerate(word_boxes):
            if gl >= wl and gr <= wr:
                return wi
        return -1

    n = len(gboxes)
    words_g = [word_of(int(g[0]), int(g[2])) for g in gboxes]

    segs: list[ScriptSeg] = []
    new_boxes = list(word_boxes)
    removed: set[int] = set()  # glyphs already split off this row
    i = 0
    while i < n:
        if not pos_of[i] or words_g[i] < 0:
            i += 1
            continue
        j = i
        while (
            j + 1 < n
            and pos_of[j + 1] == pos_of[i]
            and words_g[j + 1] == words_g[i]
        ):
            j += 1
        wi = words_g[i]
        in_word = [k for k in range(n) if words_g[k] == wi]
        normal = [k for k in in_word if not pos_of[k]]
        run = list(range(i, j + 1))
        i = j + 1
        if not normal:
            continue  # a whole-word outlier is not an edge fix
        side = None
        if run[0] == in_word[0] and run[-1] < normal[0]:
            side = "lead"
        elif run[-1] == in_word[-1] and run[0] > normal[-1]:
            side = "trail"
        if side is None:
            continue  # mid-word outliers are left alone (reference only
            # splits word edges, superscript.cpp:369-391)
        # re-meter the run in ITS OWN frame: baseline election + scale
        # solve over just these glyphs (the re-normalization that stands
        # in for recognizing with y-position penalties off).  Merged
        # boxes don't map 1:1 onto CCs (x-overlap can merge fragments),
        # so membership is by box containment.
        rl, rt, rr, rb = (
            int(gboxes[run, 0].min()),
            int(gboxes[run, 1].min()),
            int(gboxes[run, 2].max()),
            int(gboxes[run, 3].max()),
        )
        run_sel = gidx[
            (bstats[gidx, 0] >= rl)
            & (bstats[gidx, 2] <= rr)
            & (bstats[gidx, 1] >= rt)
            & (bstats[gidx, 3] <= rb)
        ]
        if len(run_sel) == 0:
            continue
        run_base, run_xh, run_scale, _amb = _row_metrics(bstats, run_sel)
        if run_scale >= scale:
            continue  # not a scaled-down glyph: normal punctuation etc.
        rl = int(bstats[run_sel, 0].min())
        rr = int(bstats[run_sel, 2].max())
        rt = int(bstats[run_sel, 1].min())
        rb = int(bstats[run_sel, 3].max())
        strip = _descale_strip(text_mask, rl, rr, run_base, run_scale)
        segs.append(
            ScriptSeg(
                pos=pos_of[run[0]],
                side=side,
                word_idx=wi,
                strip=strip,
                bbox=(rl, rt, rr, rb),
                height_ratio=run_xh / max(1, x_height),
            )
        )
        # shrink the word box to its normal glyphs (split_word).  A word
        # can lose runs at BOTH edges (lead + trail markers): exclude
        # every glyph already split off, or the second shrink re-expands
        # the box over the first run's erased columns
        removed.update(run)
        keep = [k for k in in_word if k not in removed]
        if keep:
            new_boxes[wi] = (
                int(gboxes[keep, 0].min()),
                int(gboxes[keep, 1].min()),
                int(gboxes[keep, 2].max()),
                int(gboxes[keep, 3].max()),
            )
    return segs, new_boxes


def decode_script_segments(net, row, words, merged: list[int]) -> None:
    """Decode this row's script segments and paste accepted text into the
    adjacent decoded words (TrySuperscriptSplits + join_words,
    superscript.cpp:369-483).  Mutates ``words`` in place: the target
    word's text gains the segment text at the matching edge and a
    ``script_pos`` attribute records (side, pos, n_chars) per attachment
    (SetAllScriptPositions, :469-474)."""
    from ..lstm.ctc import ctc_beam_decode

    segs = getattr(row, "script_segs", None)
    if not segs or not words:
        return
    drop = set(merged)

    def final_idx(orig: int) -> int:
        # fuzzy-space resolution merged some aggressive-split boxes into
        # their left neighbour; map the layout box index onto the decoded
        # word index the same way _merge_boxes does
        m = -1
        for k in range(orig + 1):
            if k not in drop:
                m += 1
        return max(0, min(m, len(words) - 1))

    for seg in segs:
        if seg.height_ratio < SUPERSCRIPT_SCALEDOWN_RATIO:
            continue  # unbelievably small (superscript_scaledown_ratio)
        log_probs, _cols, _fuzzy, _dropped = net.forward(
            seg.strip, space_px=10**9, fuzzy_px=None
        )
        text, seg_words, _cert = ctc_beam_decode(
            log_probs, net.charset, net.blank, net.space_code, None
        )
        text = text.replace(" ", "")
        if not text or any(c in _PUNCT for c in text):
            continue  # BelievableSuperscript: empty or punctuation
        conf = (
            sum(w.confidence for w in seg_words) / len(seg_words)
            if seg_words
            else 0.0
        )
        target = words[final_idx(seg.word_idx)]
        if conf < SUPERSCRIPT_BETTERED_CERTAINTY * target.confidence:
            continue  # no more certain than the word it came off of
        if seg.side == "lead":
            target.text = text + target.text
        else:
            target.text = target.text + text
        flags = list(getattr(target, "script_pos", ()))
        flags.append((seg.side, seg.pos, len(text)))
        target.script_pos = tuple(flags)
