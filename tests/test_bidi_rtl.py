"""Full bidi reading order + RTL goldens.

Ports the semantics of ResultIterator::CalculateTextlineOrder
(src/ccmain/resultiterator.cpp:284-364) including meta-markers, the RTL
trailing-neutral special rule, suffix direction marks
(AppendSuffixMarks, resultiterator.cpp:407-445), and the Hebrew RTL
golden of unittest/layout_test.cc:214 (HebrewOrderingAndSkew) — rendered
with the procedural RTL fixture alphabet and decoded by the extended
template net (the 'heb' language-pack analogue).
"""

import numpy as np
import pytest

from tesseract_spark.functions.compose import PageSpec, compose_page
from tesseract_spark.functions.fonts import RTL_CHARSET
from tesseract_spark.lstm.templates import get_net_rtl
from tesseract_spark.operators.bidi import (
    COMPLEX_WORD,
    LRM,
    MINOR_RUN_END,
    MINOR_RUN_START,
    RLM,
    render_line_text,
    textline_order,
    textline_order_marked,
    word_direction,
)
from tesseract_spark.operators.recognize import recognize_page

H = RTL_CHARSET  # 12 Hebrew letters

# logical Hebrew words from the fixture alphabet
W1, W2, W3, W4 = H[0:3], H[3:6], H[6:9], H[9:12]


def rev(w: str) -> str:
    return w[::-1]


def visual_rtl_line(logical_words: list[str]) -> str:
    """Visual (left-to-right raster) rendering of a pure-RTL logical line:
    word order reversed, each word's characters reversed."""
    return " ".join(rev(w) for w in reversed(logical_words))


# ---------------------------------------------------------------------------
# unit: direction classification and order walk


def test_word_direction():
    assert word_direction("hello") == "L"
    assert word_direction(W1) == "R"
    assert word_direction("123.") == "N"
    assert word_direction("ab" + W1) == "M"


def test_marked_order_ltr_with_rtl_run():
    dirs = ["L", "L", "R", "R", "R", "L"]
    assert textline_order_marked(dirs, True) == [
        0, 1, MINOR_RUN_START, 4, 3, 2, MINOR_RUN_END, 5,
    ]
    assert textline_order(dirs, base_rtl=False) == [0, 1, 4, 3, 2, 5]


def test_marked_order_rtl_trailing_neutral_rule():
    # resultiterator.cpp:308-334: trailing neutrals after an LTR word at
    # the (visual) right end of an RTL line read as one LTR sequence.
    dirs = ["R", "L", "N", "N"]
    assert textline_order_marked(dirs, False) == [
        MINOR_RUN_START, 1, 2, 3, MINOR_RUN_END, 0,
    ]


def test_marked_order_complex_word():
    dirs = ["L", "M", "L"]
    assert textline_order_marked(dirs, True) == [0, 1, COMPLEX_WORD, 2]


def test_render_line_text_pure_rtl():
    logical = [W1, W2, W3]
    visual = [rev(w) for w in reversed(logical)]
    dirs = ["R", "R", "R"]
    assert render_line_text(visual, dirs, False) == " ".join(logical)


def test_render_line_text_mixed_with_marks():
    # logical RTL sentence with an embedded LTR word
    visual = [rev(W3), "abc", rev(W2), rev(W1)]
    dirs = ["R", "L", "R", "R"]
    out = render_line_text(visual, dirs, False)
    assert out == f"{W1} {W2} abc{RLM} {W3}"


def test_render_line_text_ltr_with_rtl_embed():
    visual = ["see", rev(W1), rev(W2), "here"]
    dirs = ["L", "R", "R", "L"]
    out = render_line_text(visual, dirs, True)
    # minor RTL run [2,1] reversed, LRM after it (LTR paragraph)
    assert out == f"see {W2} {W1}{LRM} here"


# ---------------------------------------------------------------------------
# end-to-end RTL goldens (layout_test.cc:214 analogue)


@pytest.mark.parametrize("skew", [0.0, 0.03])
def test_hebrew_page_reading_order(skew):
    logical_lines = [[W1, W2, W3], [W4, W1, W2]]
    spec = PageSpec(
        paragraphs=[[visual_rtl_line(ws) for ws in logical_lines]],
        skew=skew,
    )
    page = compose_page(spec)
    spans, _layout = recognize_page(page.image, spec.dpi, net=get_net_rtl())
    expected = "\n".join(" ".join(ws) for ws in logical_lines)
    assert [(s.kind, s.text) for s in spans] == [("text", expected)]


def test_hebrew_with_embedded_ltr_word():
    # logical: W1 W2 abc W3 (RTL base) -> visual: W3r abc W2r W1r
    visual = f"{rev(W3)} abc {rev(W2)} {rev(W1)}"
    spec = PageSpec(paragraphs=[[visual]])
    page = compose_page(spec)
    spans, _layout = recognize_page(page.image, spec.dpi, net=get_net_rtl())
    assert len(spans) == 1
    assert spans[0].text == f"{W1} {W2} abc{RLM} {W3}"


def test_ltr_pages_unaffected_by_rtl_net():
    spec = PageSpec(paragraphs=[["plain english text", "stays the same"]])
    page = compose_page(spec)
    spans, _layout = recognize_page(page.image, spec.dpi, net=get_net_rtl())
    assert [(s.kind, s.text) for s in spans] == [
        ("text", "plain english text\nstays the same")
    ]


def test_hocr_paragraph_dir_attribute(spark):
    """dir='rtl' on ocr_par when strong-RTL words dominate
    (hocrrenderer.cpp:217-226); LTR paragraphs carry no dir."""
    import pandas as pd

    from tesseract_spark.operators.sinks import WORDS_SCHEMA, to_hocr

    def wrow(doc, text, wn):
        return dict(
            doc_id=doc, media_ref="m-" + doc, block_num=1, par_num=1,
            line_num=1, word_num=wn, left=10 * wn, top=0, width=8,
            height=12, conf=95.0, text=text, baseline=12,
            permuter="top_choice", rating=0.1, certainty=-1.0, choices=[],
            blanks=min(wn - 1, 1), font="", bold=0, italic=0, mono=0,
            pointsize=0, smallcaps=0, underlined=0,
        )

    rows = [wrow("rtl", "אבג", 1), wrow("rtl", "דהו", 2),
            wrow("ltr", "abc", 1), wrow("ltr", "def", 2)]
    words = spark.createDataFrame(pd.DataFrame(rows), schema=WORDS_SCHEMA)
    out = {r.doc_id: r.hocr for r in to_hocr(words).collect()}
    assert "<p class=\"ocr_par\" dir='rtl'>" in out["rtl"]
    assert "dir='rtl'" not in out["ltr"]


def test_hocr_dir_covers_presentation_forms(spark):
    """The RTL class derives from bidi's ranges: presentation-form
    codepoints (U+FB1D-FDFF, U+FE70-FEFF) count as strong RTL for the
    paragraph dir attribute, matching the walk that ordered the text."""
    import pandas as pd

    from tesseract_spark.operators.sinks import WORDS_SCHEMA, to_hocr

    rows = [dict(
        doc_id="d", media_ref="m", block_num=1, par_num=1, line_num=1,
        word_num=1, left=0, top=0, width=8, height=12, conf=95.0,
        text="ﺍﺎ", baseline=12, permuter="top_choice", rating=0.1,
        certainty=-1.0, choices=[], blanks=0, font="",
        bold=0, italic=0, mono=0, pointsize=0, smallcaps=0, underlined=0,
    )]
    words = spark.createDataFrame(pd.DataFrame(rows), schema=WORDS_SCHEMA)
    assert "dir='rtl'" in to_hocr(words).collect()[0].hocr


def test_word_records_are_logical_in_reading_order():
    """LTRResultIterator parity at the WORD level: word records on an
    RTL page carry each word's symbols in LOGICAL order with its VISUAL
    box, and the record sequence follows the textline reading order
    (resultiterator.cpp:284-395) — so every words-based sink (TSV,
    hOCR, ALTO, PDF, words_to_text) emits the same logical text the
    span walk does, never visually-reversed strings."""
    from tesseract_spark.operators.recognize import recognize_page_detail

    logical = [W1, W2, W3]
    spec = PageSpec(paragraphs=[[visual_rtl_line(logical)]])
    page = compose_page(spec)
    spans, words, _l = recognize_page_detail(
        page.image, 300, net=get_net_rtl()
    )
    assert [w.text for w in words] == logical
    assert [w.word_num for w in words] == [1, 2, 3]
    # reading order = right-to-left boxes: lefts strictly decreasing
    lefts = [w.left for w in words]
    assert lefts == sorted(lefts, reverse=True)
    # gap-derived blanks stay sane in reading order (1 between words)
    assert [w.blanks for w in words] == [0, 1, 1]
