"""WordFontAttributes tests (ltrresultiterator.cpp:152-200): bold /
italic / monospace / pointsize from a font-variant template bank (the
multi-font prototype configs of the legacy inttemp), word face elected
by majority vote (font_recognition_pass, control.cpp:1900-1960), hOCR
<strong>/<em> markup (hocrrenderer.cpp:308-312, 379-383)."""

import numpy as np

from tesseract_spark.functions.fonts import (
    CELL_H,
    bold_variant,
    get_font,
    italic_variant,
    mask_to_gray,
    render_line_styled,
)
from tesseract_spark.lstm.templates import get_net, get_net_fonts
from tesseract_spark.operators.recognize import recognize_page_detail


def _page(strips: list[np.ndarray], vgap: int = 8) -> np.ndarray:
    w = max(s.shape[1] for s in strips) + 24
    h = sum(s.shape[0] for s in strips) + vgap * (len(strips) - 1) + 24
    page = np.zeros((h, w), dtype=bool)
    y = 12
    for st in strips:
        page[y : y + st.shape[0], 12 : 12 + st.shape[1]] = st
        y += st.shape[0] + vgap
    return mask_to_gray(page)


# ------------------------------------------------------------ variants --


def test_bold_variant_thickens_strokes_same_width():
    g = get_font()["o"]
    b = bold_variant(g)
    assert b.shape == g.shape
    assert b.sum() > g.sum()
    assert (b & g).sum() == g.sum()  # superset: dilation never erases


def test_italic_variant_shears_and_keeps_ink():
    g = get_font()["h"]
    it = italic_variant(g)
    assert it.sum() == g.sum()
    assert it.any(axis=0)[0] and it.any(axis=0)[-1]  # trimmed to ink


def test_variant_net_decodes_all_faces():
    net = get_net_fonts()
    for style in ("normal", "bold", "italic"):
        strip = render_line_styled("quick fox", style)
        _s, words, _l = recognize_page_detail(
            _page([strip]), net=net, font_attrs=True
        )
        assert " ".join(w.text for w in words) == "quick fox", style


def test_plain_net_unchanged_by_variant_machinery():
    # the flagship single-font net has no duplicate template codes and
    # takes the fast vec_all path
    net = get_net()
    assert not any(net._dup_codes.values())
    assert all(len(v) == 1 for v in net.variants.values())


# ---------------------------------------------------------- attributes --


def test_word_face_attribution_per_style():
    net = get_net_fonts()
    for style in ("normal", "bold", "italic"):
        strip = render_line_styled("quick fox", style)
        _s, words, _l = recognize_page_detail(
            _page([strip]), net=net, font_attrs=True
        )
        assert all(w.font == style for w in words), style
        assert all(w.bold == (style == "bold") for w in words)
        assert all(w.italic == (style == "italic") for w in words)


def test_mixed_faces_on_one_page():
    net = get_net_fonts()
    page = _page(
        [
            render_line_styled("plain words", "normal"),
            render_line_styled("bold words", "bold"),
        ]
    )
    _s, words, _l = recognize_page_detail(page, net=net, font_attrs=True)
    by_text = {w.text: w for w in words}
    assert by_text["plain"].bold == 0 and by_text["bold"].bold == 1


def test_pointsize_from_row_height():
    # CELL_H-row band at 300 dpi -> round(band_px * 72 / 300) points
    # (kPointsPerInch conversion, ltrresultiterator.cpp:162-166)
    net = get_net_fonts()
    strip = render_line_styled("quick fox", "normal")
    _s, words, _l = recognize_page_detail(
        _page([strip]), dpi=300, net=net, font_attrs=True
    )
    assert words and all(1 <= w.pointsize <= 6 for w in words)
    # attrs off -> no pointsize computed
    _s, words, _l = recognize_page_detail(_page([strip]), dpi=300)
    assert all(w.pointsize == 0 for w in words)


def test_attrs_off_leaves_words_unflagged():
    strip = render_line_styled("bold words", "bold")
    # the plain net cannot even decode bold glyphs — the variant bank is
    # what font support MEANS (a font-trained model in the reference)
    _s, words, _l = recognize_page_detail(
        _page([strip]), net=get_net_fonts()
    )
    assert words and all(w.font == "" and w.bold == 0 for w in words)


# ---------------------------------------------------------------- hOCR --


def test_hocr_strong_em_markup(spark):
    from tesseract_spark.functions.png_codec import encode_gray_png
    from tesseract_spark.operators.sinks import ocr_words, to_hocr

    page = _page(
        [
            render_line_styled("plain line", "normal"),
            render_line_styled("bold line", "bold"),
            render_line_styled("slant line", "italic"),
        ]
    )
    png = encode_gray_png(page)
    docs = spark.createDataFrame(
        [("d1", [("media", None, "m1", 0)])],
        "doc_id string, spans array<struct<kind string, text string,"
        " media_ref string, offset int>>",
    )
    media = spark.createDataFrame(
        [("m1", bytearray(png), 300)],
        "media_ref string, png binary, dpi int",
    )
    words = ocr_words(spark, docs, media, font_attrs=True)
    html = to_hocr(words, font_info=True).collect()[0].hocr
    assert "<strong>bold</strong>" in html
    assert "<em>slant</em>" in html
    assert "<strong>plain" not in html and "<em>plain" not in html
    assert "x_fsize" in html and "x_font bold" in html
    # without font columns requested the markup is absent
    plain_words = ocr_words(spark, docs, media)
    html2 = to_hocr(plain_words).collect()[0].hocr
    # columns exist but all-zero: no style markup anywhere
    assert "<strong>" not in html2 and "<em>" not in html2


# ----------------------------------------------------- smallcaps/underline --


def test_smallcaps_decode_and_attribution():
    # capital shapes at lowercase size (WERD_RES::small_caps,
    # ltrresultiterator.cpp:182): decodes as uppercase text with the
    # smallcaps face elected
    from tesseract_spark.functions.fonts import get_font_smallcaps

    sc = get_font_smallcaps()
    g = sc["A"]
    assert not g[:4].any() and not g[12:].any()  # x-height band only
    net = get_net_fonts()
    strip = render_line_styled("SMALL CAPS", "smallcaps")
    _s, words, _l = recognize_page_detail(
        _page([strip]), net=net, font_attrs=True
    )
    assert [w.text for w in words] == ["SMALL", "CAPS"]
    assert all(w.smallcaps == 1 for w in words)
    # full-size caps are NOT smallcaps
    strip = render_line_styled("SMALL CAPS", "normal")
    _s, words, _l = recognize_page_detail(
        _page([strip]), net=net, font_attrs=True
    )
    assert all(w.smallcaps == 0 for w in words)


def test_underlined_word_attribution():
    # a removed underline bar marks exactly the words above it —
    # improving on the reference's hard-coded false
    # (ltrresultiterator.cpp:175)
    from tesseract_spark.functions.fonts import glyph_width, render_line

    line = render_line("hello world")
    h, w = line.shape
    pg = np.zeros((h + 24, w + 24), dtype=bool)
    pg[12 : 12 + h, 12 : 12 + w] = line
    w_hello = sum(glyph_width(c) for c in "hello") + 4
    pg[25:27, 12 : 12 + w_hello] = True  # bar under the first word
    _s, words, layout = recognize_page_detail(mask_to_gray(pg))
    assert [x.text for x in words] == ["hello", "world"]
    assert len(layout.underline_bars) == 1
    assert [x.underlined for x in words] == [1, 0]
