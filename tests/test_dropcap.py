"""Drop-cap tests (BLOCK::compute_row_margins, src/ccstruct/
ocrblock.cpp:320-369): an oversized first-line blob whose bottom
reaches the mid-height of the second line is a drop cap; rows beside it
measure their margin one space past the cap, the cap decodes at its own
scale and joins the first word, and the paragraph model sees
has_drop_cap (paragraphs.cpp:2475)."""

import numpy as np

from tesseract_spark.functions.fonts import CELL_H, get_font, mask_to_gray
from tesseract_spark.operators.recognize import recognize_page_detail

VGAP = 8


def _line(text: str, gap: int = 1) -> np.ndarray:
    font = get_font()
    cols = []
    for i, ch in enumerate(text):
        if ch == " ":
            cols.append(np.zeros((CELL_H, 6), dtype=bool))
            continue
        cols.append(font[ch])
        if i + 1 < len(text) and text[i + 1] != " ":
            cols.append(np.zeros((CELL_H, gap), dtype=bool))
    return np.hstack(cols)


def _cap(ch: str, scale: int) -> np.ndarray:
    g = get_font()[ch]
    ys = np.flatnonzero(g.any(axis=1))
    return np.kron(
        g[ys[0] : ys[-1] + 1], np.ones((scale, scale), dtype=bool)
    )


def _dropcap_page(ch: str = "O", cap_scale: int = 3):
    cap = _cap(ch, cap_scale)
    l1, l2, l3 = (
        _line("nce upon a"),
        _line("time there was"),
        _line("more text here"),
    )
    w = max(cap.shape[1] + 4 + max(l1.shape[1], l2.shape[1]), l3.shape[1])
    page = np.zeros((3 * CELL_H + 2 * VGAP + 24, w + 24), dtype=bool)
    x0 = 12
    y1 = 12
    y2 = y1 + CELL_H + VGAP
    y3 = y2 + CELL_H + VGAP
    page[y1 : y1 + cap.shape[0], x0 : x0 + cap.shape[1]] = cap
    tx = x0 + cap.shape[1] + 4
    page[y1 : y1 + CELL_H, tx : tx + l1.shape[1]] = l1
    page[y2 : y2 + CELL_H, tx : tx + l2.shape[1]] = l2
    page[y3 : y3 + CELL_H, x0 : x0 + l3.shape[1]] = l3
    return mask_to_gray(page)


def test_dropcap_joins_first_word_one_paragraph():
    spans, words, layout = recognize_page_detail(_dropcap_page("O"))
    texts = [s.text for s in spans if s.kind == "text"]
    assert texts == ["Once upon a\ntime there was\nmore text here"]
    assert words[0].text == "Once"


def test_dropcap_row_flag_and_margin_pad():
    _s, _w, layout = recognize_page_detail(_dropcap_page("O"))
    reg = next(g for g in layout.regions if g.kind == "text")
    assert reg.rows[0].has_drop_cap
    assert reg.rows[0].cap_bbox is not None
    # the row BESIDE the cap (second line) carries the pad; the row
    # below it does not (ocrblock.cpp:322-324)
    assert reg.rows[1].drop_cap_pad > 0
    assert reg.rows[2].drop_cap_pad == 0
    # single paragraph despite the indented first two lines
    assert reg.paragraphs == [[0, 1, 2]]


def test_dropcap_first_word_box_absorbs_cap():
    _s, words, layout = recognize_page_detail(_dropcap_page("O"))
    reg = next(g for g in layout.regions if g.kind == "text")
    cl, ct, cr, cb = reg.rows[0].cap_bbox
    w0 = words[0]
    assert w0.left <= cl and w0.left + w0.width >= cr


def test_short_tall_glyph_is_not_a_dropcap():
    # a blob reaching only the second line's TOP fails the
    # mid-second-line rule (ocrblock.cpp:352-357) and is re-clustered
    # as an ordinary blob — no crash, no cap flag
    spans, _w, layout = recognize_page_detail(_dropcap_page("O", 2))
    reg = next(g for g in layout.regions if g.kind == "text")
    assert not any(r.has_drop_cap for r in reg.rows)


def test_uniform_large_scale_page_unaffected():
    # a page rendered entirely at scale 2 has no height outliers: the
    # relative 1.8x-median gate never fires
    from tesseract_spark.functions.fonts import render_line
    from tesseract_spark.operators.recognize import recognize_page

    big = render_line("hello world", scale=2)
    page = np.zeros((big.shape[0] + 24, big.shape[1] + 24), dtype=bool)
    page[12 : 12 + big.shape[0], 12 : 12 + big.shape[1]] = big
    spans, layout = recognize_page(mask_to_gray(page))
    assert [s.text for s in spans if s.kind == "text"] == ["hello world"]
    assert not any(
        r.has_drop_cap for g in layout.regions if g.kind == "text"
        for r in g.rows
    )


def test_dropcap_word_font_attribution_not_garbage():
    """The cap prefix must not shift char_ts alignment: font votes pair
    each char with ITS OWN timestep (cap chars carry sentinel -1 and
    abstain), so a normal-face drop-cap page elects 'normal'."""
    from tesseract_spark.lstm.templates import get_net_fonts

    _s, words, _l = recognize_page_detail(
        _dropcap_page("O"), net=get_net_fonts(), font_attrs=True
    )
    assert words[0].text == "Once"
    assert words[0].font == "normal" and words[0].smallcaps == 0


def test_dropcap_paragraph_breaks_from_predecessor():
    """The FIRST line's margin is measured relative to the block, not
    past its own cap (ocrblock.cpp:322-325): a drop-cap paragraph at
    normal line pitch still breaks from the preceding plain paragraph
    via the indent rule."""
    cap = _cap("O", 3)
    l0a, l0b = _line("plain text here"), _line("more plain text")
    l1, l2 = _line("nce upon a"), _line("time there was")
    w = max(
        cap.shape[1] + 4 + max(l1.shape[1], l2.shape[1]),
        l0a.shape[1],
        l0b.shape[1],
    )
    page = np.zeros((4 * CELL_H + 3 * VGAP + 24, w + 24), dtype=bool)
    x0, y = 12, 12
    for ln in (l0a, l0b):
        page[y : y + CELL_H, x0 : x0 + ln.shape[1]] = ln
        y += CELL_H + VGAP
    page[y : y + cap.shape[0], x0 : x0 + cap.shape[1]] = cap
    tx = x0 + cap.shape[1] + 4
    page[y : y + CELL_H, tx : tx + l1.shape[1]] = l1
    page[y + CELL_H + VGAP : y + 2 * CELL_H + VGAP, tx : tx + l2.shape[1]] = l2
    spans, _w, layout = recognize_page_detail(mask_to_gray(page))
    assert [s.text for s in spans if s.kind == "text"] == [
        "plain text here\nmore plain text",
        "Once upon a\ntime there was",
    ]
    reg = next(g for g in layout.regions if g.kind == "text")
    assert reg.paragraphs == [[0, 1], [2, 3]]
