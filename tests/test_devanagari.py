"""Shiro-rekha splitting (src/textord/devanagari_processing.cpp).

The fixture joins x-height glyphs under a synthetic top bar — the
conjoined-word shape of Devanagari — and expects the splitter to cut the
bar at the inter-glyph gaps so the word separates into per-glyph cells,
each keeping its own stretch of the bar (the shape Indic models train on).
"""

import numpy as np

from tesseract_spark.functions.fonts import render_line
from tesseract_spark.functions.image_ops import label_components
from tesseract_spark.operators.devanagari import (
    split_shiro_rekha_page,
    split_word_shiro_rekha,
)


def _top_bar_word(text: str = "mno", scale: int = 2) -> np.ndarray:
    """Render x-height glyphs and weld a 2px shiro-rekha onto their tops
    (glyph band starts at row XHEIGHT_TOP*scale = 8)."""
    glyphs = render_line(text, scale=scale)
    canvas = np.zeros((glyphs.shape[0] + 20, glyphs.shape[1] + 20), dtype=bool)
    canvas[10 : 10 + glyphs.shape[0], 10 : 10 + glyphs.shape[1]] |= glyphs
    bar_y = 10 + 4 * scale - 2  # 2 rows immediately above the glyph tops
    canvas[bar_y : bar_y + 2, 10 : 10 + glyphs.shape[1]] = True
    return canvas


def test_top_bar_welds_word_into_one_cc():
    _lbl, n = label_components(_top_bar_word(), connectivity=8)
    assert n == 1  # the bar makes the whole word one component


def test_split_separates_glyph_cells():
    page = _top_bar_word("mno")
    out, n_splits = split_shiro_rekha_page(page)
    assert n_splits >= 2  # one cut per inter-glyph kern gap
    _lbl, n = label_components(out, connectivity=8)
    assert n == 3  # one cell per glyph
    # every cell keeps bar ink at the bar rows (cells retain their own
    # stretch of the shiro-rekha, devanagari_processing.cpp:311-315)
    lbl, n = label_components(out, connectivity=8)
    bar_y = 10 + 8 - 2
    for cc in range(1, n + 1):
        ys = np.nonzero((lbl == cc).any(axis=1))[0]
        assert ys.min() <= bar_y + 1


def test_cells_align_with_glyph_extents():
    from tesseract_spark.functions.fonts import glyph_width

    page = _top_bar_word("mno")
    out, _ = split_shiro_rekha_page(page)
    lbl, n = label_components(out, connectivity=8)
    lefts = sorted(
        int(np.nonzero((lbl == cc).any(axis=0))[0].min()) for cc in range(1, n + 1)
    )
    # cell lefts sit at the rendered glyph x offsets
    exp = [10]
    for ch in "mn":
        exp.append(exp[-1] + (glyph_width(ch) + 1) * 2)
    assert lefts == exp


def test_guards_leave_normal_text_alone():
    # separate Latin glyphs: no wide CC, nothing to split
    glyphs = render_line("mno", scale=2)
    page = np.zeros((glyphs.shape[0] + 20, glyphs.shape[1] + 20), dtype=bool)
    page[10 : 10 + glyphs.shape[0], 10 : 10 + glyphs.shape[1]] |= glyphs
    out, n_splits = split_shiro_rekha_page(page)
    assert n_splits == 0
    assert (out == page).all()

    # a bar in the bottom half of a word is not a shiro-rekha (:245-251)
    word = np.zeros((20, 60), dtype=bool)
    word[4:16, 5:12] = True
    word[4:16, 20:27] = True
    word[4:16, 40:47] = True
    word[14:16, :] = True  # "bar" near the bottom
    out2, ns2 = split_word_shiro_rekha(word)
    assert ns2 == 0 and (out2 == word).all()
