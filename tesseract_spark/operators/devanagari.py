"""Devanagari shiro-rekha splitting (src/textord/devanagari_processing.cpp).

Indic-script words are written under a connecting top bar (the
shiro-rekha), so an entire word arrives as ONE connected component and no
per-glyph segmentation is possible until the bar is split.  The
reference's ``ShiroRekhaSplitter::SplitWordShiroRekha``
(devanagari_processing.cpp:228-341) does, per word CC:

1. locate the bar: global maximum of the horizontal (per-row) pixel
   histogram, expanded up/down while rows stay >= 70% of the peak
   (``GetShiroRekhaYExtents``, :345-375); bar thickness == stroke width;
2. guards: bar must lie in the top half of the word (:245-251) and be no
   thicker than height/3 (:253-259);
3. build an x-height-only view: clear the bar band
   [top - w/3, top + 5w/3) and everything below bottom + leeway
   (leeway = xheight - stroke_width when known, else 3w, :262-280);
4. binarize the vertical (per-column) histogram of that view at
   stroke_width/4 (noise, :286-293) and split the bar wherever a gap of
   >= stroke_width/2 follows a component of >= stroke_width/2 (:297-339)
   by clearing the bar-band pixels of the gap columns.

Each resulting cell keeps its own stretch of the bar — exactly the shape
the Indic LSTM models are trained on.  The multi-code decode such cells
need downstream already exists (lstm/tessdata.UnicharCompress, the
recoder of unicharcompress.h:34-118).
"""

from __future__ import annotations

import numpy as np

# reference guard constants (devanagari_processing.cpp)
K_TOPLINE_THRESH_PCT = 70  # :355 — 70% of histogram peak joins the bar
UNSPECIFIED_XHEIGHT = -1  # devanagari_processing.h:103


def shiro_rekha_extents(word: np.ndarray) -> tuple[int, int, int]:
    """(top, bottom, ylevel) of the shiro-rekha band of one word mask
    (GetShiroRekhaYExtents, devanagari_processing.cpp:345-375).
    ``bottom`` is inclusive, matching the reference's llimit walk."""
    hist = word.sum(axis=1)
    ylevel = int(np.argmax(hist))
    thresh = (int(hist[ylevel]) * K_TOPLINE_THRESH_PCT) // 100
    top = ylevel
    while top > 0 and hist[top - 1] >= thresh:
        top -= 1
    bottom = ylevel
    while bottom + 1 < len(hist) and hist[bottom + 1] >= thresh:
        bottom += 1
    return top, bottom, ylevel


def split_word_shiro_rekha(
    word: np.ndarray, xheight: int = UNSPECIFIED_XHEIGHT
) -> tuple[np.ndarray, int]:
    """Split one conjoined word mask along its shiro-rekha.

    Returns (split mask, number of splits performed).  The maximal-split
    strategy is used (MAXIMAL_SPLIT, devanagari_processing.h:68-79): the
    whole inter-cell gap of the bar is cleared, which is what OCR wants
    (:311-315 'a maximal split may be needed for OCR')."""
    h, w = word.shape
    if not word.any():
        return word, 0
    top, bottom, ylevel = shiro_rekha_extents(word)
    stroke_width = bottom - top + 1
    # guards (devanagari_processing.cpp:245-259)
    if ylevel > h // 2:
        return word, 0  # shirorekha shouldn't be in the bottom half
    if stroke_width > h // 3:
        return word, 0  # even the boldest of fonts shouldn't do this

    # x-height-only view: clear the bar band and the sub-baseline region
    view = word.copy()
    band_top = max(0, top - stroke_width // 3)
    band_h = 5 * stroke_width // 3
    view[band_top : band_top + band_h] = False
    leeway = (
        xheight - stroke_width
        if xheight != UNSPECIFIED_XHEIGHT
        else stroke_width * 3
    )
    view[min(h, bottom + max(0, leeway)) :] = False

    # binarized vertical histogram (noise floor stroke_width/4)
    col = view.sum(axis=0) > (stroke_width // 4)

    out = word.copy()
    n_splits = 0
    i = 0
    cur_component_width = 0
    while i < w:
        if not col[i]:
            j = 0
            while i + j < w and not col[i + j]:
                j += 1
            if j >= stroke_width // 2 and cur_component_width >= max(
                1, stroke_width // 2
            ):
                # clear the bar across the whole gap (maximal split)
                out[band_top : band_top + band_h, i : i + j] = False
                n_splits += 1
                cur_component_width = 0
            i += j
        else:
            i += 1
            cur_component_width += 1
    return out, n_splits


def split_shiro_rekha_page(
    ink: np.ndarray,
    xheight: int = UNSPECIFIED_XHEIGHT,
    return_mask: bool = False,
):
    """Run the splitter over every connected component of a page mask
    (ShiroRekhaSplitter::Split walking word CCs,
    devanagari_processing.cpp:126-152).  Only wide components — wider
    than twice their height, the conjoined-word signature — are
    considered; isolated glyphs pass through untouched.

    Returns (page mask with splits applied, total number of splits);
    with ``return_mask`` also the ink of the words that WERE split —
    the splitter's word knowledge (the reference keeps the split words'
    boxes for pageseg, devanagari_processing.h:84-101), used to protect
    shiro-rekha stretches from the line finder downstream."""
    from ..functions.image_ops import label_and_stats

    if not ink.any():
        return (ink, 0, None) if return_mask else (ink, 0)
    labels, n, stats = label_and_stats(ink)
    out = ink.copy()
    split_mask = np.zeros_like(ink) if return_mask else None
    total = 0
    for i in range(n):
        l, t, r, b, _a = (int(v) for v in stats[i])
        cw, ch = r - l, b - t
        if ch <= 0 or cw < 2 * ch:
            continue
        word = ink[t:b, l:r] & (labels[t:b, l:r] == i + 1)
        split, ns = split_word_shiro_rekha(word, xheight)
        if ns:
            # replace this CC's pixels with the split version
            region = out[t:b, l:r]
            region[labels[t:b, l:r] == i + 1] = False
            region |= split
            total += ns
            if split_mask is not None:
                split_mask[t:b, l:r] |= split
    if return_mask:
        return out, total, split_mask
    return out, total
