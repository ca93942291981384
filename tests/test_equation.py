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


# ---------------------------------------------------------------------------
# Seed expansion + satellite merge (ExpandSeed equationdetect.cpp:1038-1077,
# ProcessMathBlockSatelliteParts :1248-1293)

from tesseract_spark.operators.equation import (  # noqa: E402
    expand_equation_paragraphs,
)

EQ1 = "12+34=46 12<46"
EQ2 = "56+78=134 56<134"


def test_expand_merges_vertical_equation_seeds():
    # two stacked display-equation paragraphs within kYGapTh=0.2*res
    boxes = [(0, 0, 600, 16), (40, 20, 520, 56), (60, 80, 500, 96)]
    texts = ["plain prose words here that stay text", EQ1, EQ2]
    groups, is_eq = expand_equation_paragraphs(boxes, texts, 300)
    assert groups == [[0], [1, 2]]
    assert is_eq == [False, True]


def test_expand_gap_beyond_threshold_does_not_merge():
    # y_gap 70 > round(0.2*300)=60: seeds stay separate spans
    boxes = [(40, 0, 520, 16), (40, 86, 520, 102)]
    groups, is_eq = expand_equation_paragraphs(boxes, [EQ1, EQ2], 300)
    assert groups == [[0], [1]]
    assert is_eq == [True, True]


def test_expand_absorbs_small_near_fragment():
    # a short non-seed continuation fragment hugging the seed
    # (IsNearSmallNeighbor: y_gap <= 0.05*res, smaller both ways)
    boxes = [(40, 0, 520, 16), (200, 26, 360, 42)]
    texts = [EQ1, "+ 9 x"]
    groups, is_eq = expand_equation_paragraphs(boxes, texts, 300)
    assert groups == [[0, 1]]
    assert is_eq == [True]


def test_expand_fence_blocks_jump_over_skipped_text():
    # a full-width prose paragraph between two seeds fences the far seed
    # (the skipped-part guard, equationdetect.cpp:1196-1209)
    boxes = [
        (40, 0, 520, 16),    # seed A
        (0, 40, 600, 120),   # wide prose (skipped: not a small neighbor)
        (40, 140, 520, 156), # seed B, beyond the fence
    ]
    texts = [EQ1, "many plain prose words " * 4, EQ2]
    groups, is_eq = expand_equation_paragraphs(boxes, texts, 300)
    assert groups == [[0], [1], [2]]
    assert is_eq == [True, False, True]


def test_satellite_short_text_between_math_blocks():
    # a short text row sandwiched between two equation blocks within
    # 0.1*res becomes PT_EQUATION and absorbs them (:1274-1292); the
    # taller prose paragraph keeps the median height honest
    boxes = [
        (0, 0, 600, 100),     # tall prose (text)
        (40, 130, 520, 146),  # equation block (gap 70 from satellite: no
        #                       direct seed merge, satellite path only)
        (100, 170, 460, 186), # short text satellite, within both blocks'
        #                       x-extent, y_gap 24 <= 30 to both
        (40, 210, 520, 226),  # equation block
    ]
    texts = [
        "plain prose words here that stay text " * 3,
        EQ1,
        "where x is",
        EQ2,
    ]
    groups, is_eq = expand_equation_paragraphs(boxes, texts, 300)
    assert [0] in groups and [1, 2, 3] in groups
    assert is_eq[groups.index([1, 2, 3])]


def test_two_line_display_equation_single_span():
    # VERDICT r3 item 3 done-criterion: a two-line displayed equation the
    # paragraph splitter breaks apart emits ONE kind='equation' span
    lines = ["some ordinary words here", "second line of text"]
    page = compose_page(
        PageSpec(paragraphs=[lines, [EQ1], [EQ2]])
    )
    spans, _ = recognize_page(page.image, 300, net=get_net_math())
    assert [(s.kind, s.text) for s in spans] == [
        ("text", "\n".join(lines)),
        ("equation", EQ1 + "\n" + EQ2),
    ]
