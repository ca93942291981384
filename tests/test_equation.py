"""Equation-region taxonomy tests (EquationDetect analogue).

Threshold gates from src/ccmain/equationdetect.cpp:78-82 and :942-974,
the PT_EQUATION / PT_INLINE_EQUATION kinds of publictypes.h:51-67, and an
end-to-end golden: a math paragraph emits kind='equation' while prose
stays kind='text'.
"""

from tesseract_spark.functions.compose import PageSpec, compose_page
from tesseract_spark.lstm.templates import get_net_math
from tesseract_spark.operators.equation import (
    inline_equation_words,
    is_equation_text,
)
from tesseract_spark.operators.recognize import recognize_page


def test_display_equation_seed_gates():
    assert is_equation_text("12+34=46 78<90")
    # too few glyphs (< kSeedBlobsCountTh = 10)
    assert not is_equation_text("1+2=3")
    # too few math glyphs (<= kSeedMathBlobsCount = 2)
    assert not is_equation_text("12345 67890 = + nothing")
    # density below kMathDigitDensityTh1 on a long prose line
    assert not is_equation_text("the answer is x = y + z exactly when stated")


def test_digit_heavy_prose_is_not_equation():
    # digits alone never seed an equation (math_blobs gate): the 'punct'
    # golden's price line must stay text
    assert not is_equation_text("Qty: 42 (net), price 3.14!")
    assert not is_equation_text("1234567890 1234567890")


def test_inline_equation_words():
    ws = "solve 12+34=46 now please more words".split()
    assert inline_equation_words(ws) == [1]
    # a display equation line yields no inline words
    assert inline_equation_words("12+34=46 78<90".split()) == []
    assert inline_equation_words("plain words only".split()) == []


def test_equation_span_golden():
    eq = "12+34=46 12<46"
    lines = ["some ordinary words here", "second line of text"]
    page = compose_page(PageSpec(paragraphs=[lines, [eq]]))
    spans, _ = recognize_page(page.image, 300, net=get_net_math())
    assert [(s.kind, s.text) for s in spans] == [
        ("text", "\n".join(lines)),
        ("equation", eq),
    ]


def test_prose_page_emits_no_equation_kind():
    page = compose_page(
        PageSpec(paragraphs=[["Qty: 42 (net), price 3.14!"], ["plain words"]])
    )
    spans, _ = recognize_page(page.image, 300)
    assert all(s.kind == "text" for s in spans)
