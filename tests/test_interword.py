"""preserve_interword_spaces tests (tesseractclass.cpp:425;
ResultIterator::AppendUTF8WordText numSpaces walk,
src/ccmain/resultiterator.cpp:743-751) over the WERD::blanks analogue
(floor(gap / space_size) min 1, src/textord/tospace.cpp:898-913)."""

import numpy as np

from tesseract_spark.functions.fonts import CELL_H, get_font, mask_to_gray
from tesseract_spark.operators.recognize import recognize_page_detail


def _line(text: str, gap: int = 1) -> np.ndarray:
    font = get_font()
    cols = []
    for i, ch in enumerate(text):
        cols.append(font[ch])
        if i + 1 < len(text):
            cols.append(np.zeros((CELL_H, gap), dtype=bool))
    return np.hstack(cols)


def _gap(px: int) -> np.ndarray:
    return np.zeros((CELL_H, px), dtype=bool)


def _page(strip: np.ndarray) -> np.ndarray:
    h, w = strip.shape
    page = np.zeros((h + 24, w + 24), dtype=bool)
    page[12 : 12 + h, 12 : 12 + w] = strip
    return mask_to_gray(page)


def test_blanks_single_space_gap():
    gray = _page(np.hstack([_line("ab"), _gap(7), _line("cd")]))
    _s, words, _l = recognize_page_detail(gray)
    assert [w.text for w in words] == ["ab", "cd"]
    assert words[0].blanks == 0  # BOL word carries no leading blanks
    assert words[1].blanks == 1


def test_blanks_counts_wide_gap():
    # a gap several space-widths wide floors to multiple blanks
    # (tospace.cpp:908: floor(current_gap / row->space_size))
    gray = _page(np.hstack([_line("ab"), _gap(12), _line("cd")]))
    _s, words, _l = recognize_page_detail(gray)
    assert [w.text for w in words] == ["ab", "cd"]
    assert words[1].blanks >= 2


def test_blanks_never_below_one_between_words():
    # min 1 (tospace.cpp:909-911): any recognized word gap is >= 1 blank
    gray = _page(np.hstack([_line("ab"), _gap(5), _line("cd")]))
    _s, words, _l = recognize_page_detail(gray)
    assert len(words) == 2 and words[1].blanks >= 1


def test_words_to_text_preserve_and_collapse(spark):
    from tesseract_spark.functions.png_codec import encode_gray_png
    from tesseract_spark.operators.sinks import ocr_words, words_to_text

    wide = _page(np.hstack([_line("ab"), _gap(12), _line("cd")]))
    png = encode_gray_png(wide)
    docs = spark.createDataFrame(
        [("d1", [("media", None, "m1", 0)])],
        "doc_id string, spans array<struct<kind string, text string,"
        " media_ref string, offset int>>",
    )
    media = spark.createDataFrame(
        [("m1", bytearray(png), 300)],
        "media_ref string, png binary, dpi int",
    )
    words = ocr_words(spark, docs, media)
    assert "blanks" in words.columns
    collapsed = words_to_text(words).collect()[0].text
    assert collapsed == "ab cd"
    preserved = words_to_text(
        words, preserve_interword_spaces=True
    ).collect()[0].text
    # the wide gap survives as multiple spaces (numSpaces =
    # word->space(), resultiterator.cpp:745)
    assert preserved.startswith("ab  ") and preserved.endswith("cd")
    assert "  " in preserved


def test_words_to_text_line_and_paragraph_separators(spark):
    from tesseract_spark.functions.png_codec import encode_gray_png
    from tesseract_spark.operators.sinks import ocr_words, words_to_text

    l1, l2 = _line("ab"), _line("cd")
    w = max(l1.shape[1], l2.shape[1]) + 24
    page = np.zeros((2 * CELL_H + 8 + 24, w), dtype=bool)
    page[12 : 12 + CELL_H, 12 : 12 + l1.shape[1]] = l1
    page[12 + CELL_H + 8 : 12 + 2 * CELL_H + 8, 12 : 12 + l2.shape[1]] = l2
    png = encode_gray_png(mask_to_gray(page))
    docs = spark.createDataFrame(
        [("d1", [("media", None, "m1", 0)])],
        "doc_id string, spans array<struct<kind string, text string,"
        " media_ref string, offset int>>",
    )
    media = spark.createDataFrame(
        [("m1", bytearray(png), 300)],
        "media_ref string, png binary, dpi int",
    )
    text = words_to_text(ocr_words(spark, docs, media)).collect()[0].text
    # two rows of one paragraph join with the line separator
    assert text == "ab\ncd"
