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


# ---------------------------------------------------------------------------
# end-to-end: real conjoined rendering -> split -> decode
# (SplitForPageseg before SegmentPage, tesseractclass PrepareForPageseg)


def _deva_page(chunk: str, doc_id: int = 0, i: int = 1):
    from tesseract_spark.derived import chunk_page_spec
    from tesseract_spark.functions.compose import compose_page
    from tesseract_spark.functions.fonts import DEVA_CHARSET

    trans = str.maketrans(
        "abcdefghijklmnopqrstuvwxyz", (DEVA_CHARSET * 3)[:26]
    )
    dv = chunk.translate(trans)
    return compose_page(chunk_page_spec(doc_id, i, dv)), dv


def test_deva_word_renders_as_one_cc():
    from tesseract_spark.functions.fonts import DEVA_CHARSET, render_line

    for scale in (1, 2):
        m = render_line(DEVA_CHARSET[:5], scale=scale)
        page = np.zeros((m.shape[0] + 8, m.shape[1] + 8), dtype=bool)
        page[4 : 4 + m.shape[0], 4 : 4 + m.shape[1]] = m
        _lbl, n = label_components(page, connectivity=8)
        assert n == 1


def test_deva_split_cells_equal_font_glyphs():
    from tesseract_spark.functions.fonts import (
        DEVA_CHARSET,
        get_font,
        render_line,
    )

    word = DEVA_CHARSET[:4]
    m = render_line(word, scale=1)
    page = np.zeros((m.shape[0] + 8, m.shape[1] + 8), dtype=bool)
    page[4 : 4 + m.shape[0], 4 : 4 + m.shape[1]] = m
    out, ns = split_shiro_rekha_page(page)
    assert ns == len(word) - 1
    lbl, n = label_components(out, connectivity=8)
    assert n == len(word)
    font = get_font()
    cells = []
    for cc in range(1, n + 1):
        ys, xs = np.nonzero(lbl == cc)
        cells.append((xs.min(), ys - ys.min(), xs - xs.min()))
    cells.sort(key=lambda c: c[0])
    for (x0, cy, cx), ch in zip(cells, word):
        gy, gx = np.nonzero(font[ch])
        assert np.array_equal(np.sort(cy * 1000 + cx), np.sort(
            (gy - gy.min()) * 1000 + (gx - gx.min())
        )), f"cell at {x0} != glyph {ch!r}"


def test_deva_end_to_end_decode_with_skew_and_long_words():
    """Long words' bars are h-line candidates (>= resolution/4 px); the
    split-word protect mask must keep the line finder off them, and the
    skewed variants exercise the pre-unshear pass."""
    from tesseract_spark.lstm.templates import get_net_deva
    from tesseract_spark.operators.recognize import recognize_page

    net = get_net_deva()
    chunk = "zebra yonder xylophone wavers under torch sky run quiet pond"
    for doc_id, i in [(0, 1), (9, 1), (9, 2), (18, 4)]:  # skewed + both scales
        page, dv = _deva_page(chunk, doc_id, i)
        spans, layout = recognize_page(
            page.image, 300, net=net, deva_split=True
        )
        got = "\n".join(s.text for s in spans if s.kind == "text")
        ws = dv.split(" ")
        exp = "\n".join(
            " ".join(ws[j : j + 4]) for j in range(0, len(ws), 4)
        )
        assert got == exp, (doc_id, i)
        assert layout.deva_splits == sum(len(w) - 1 for w in ws)


def test_deva_page_with_real_rule_still_removes_it():
    """The protect mask shields split words only: a genuine full-width
    separator rule on the same page is still found and removed."""
    from tesseract_spark.functions.fonts import mask_to_gray, render_line
    from tesseract_spark.operators.recognize import recognize_page
    from tesseract_spark.lstm.templates import get_net_deva
    from tesseract_spark.functions.fonts import DEVA_CHARSET

    line = render_line(DEVA_CHARSET[:3] + " " + DEVA_CHARSET[3:7], scale=2)
    H = line.shape[0] + 60
    W = max(line.shape[1] + 20, 320)
    page = np.zeros((H, W), dtype=bool)
    page[10 : 10 + line.shape[0], 10 : 10 + line.shape[1]] = line
    page[line.shape[0] + 30 : line.shape[0] + 33, 5 : W - 5] = True  # rule
    spans, layout = recognize_page(
        mask_to_gray(page), 300, net=get_net_deva(), deva_split=True
    )
    assert layout.h_rules == 1  # the genuine rule is found and removed
    got = " ".join(s.text for s in spans if s.kind == "text")
    assert got == DEVA_CHARSET[:3] + " " + DEVA_CHARSET[3:7]
