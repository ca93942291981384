"""normstrngs parity — mirrors unittest/normstrngs_test.cc.

The column-expression path (functions/textnorm.py) is exercised through
Spark; the full-normal-form path through normalize_text.  Case names
track the reference test names.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tesseract_spark.functions.textnorm import (
    fullwidth_to_halfwidth,
    interchange_clean,
    normalize_col,
    normalize_series,
    normalize_text,
    ocr_normalize,
    strip_joiners_nonletter,
    strip_zero_width,
)


def one(spark, text: str, col_fn) -> str:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col_fn(F.col("t")).alias("r")).collect()[0].r


def test_basic_text(spark):
    # normstrngs_test.cc:31 BasicText — NFKC + OCR norm is identity on ASCII
    assert normalize_text("AbCd Ef") == "AbCd Ef"
    assert one(spark, "AbCd Ef", normalize_col) == "AbCd Ef"


def test_ligature_text():
    # normstrngs_test.cc:39 LigatureText — NFKC expands compatibility
    # ligatures
    assert normalize_text("ĳ") == "ij"
    assert normalize_text("ﬁnds") == "finds"


def test_ocr_specific_normalization(spark):
    # normstrngs_test.cc:52 OcrSpecificNormalization
    assert one(spark, "‘Hi", ocr_normalize) == "'Hi"
    assert one(spark, "“Hi", ocr_normalize) == '"Hi'
    assert one(spark, "Hi—", ocr_normalize) == "Hi-"
    # without OCR normalization these are untouched
    assert normalize_text("‘Hi", ocr=False) == "‘Hi"
    assert normalize_text("Hi—", ocr=False) == "Hi—"


@pytest.mark.parametrize(
    "ch",
    list("‐‑‒–—―⁻₋−")
    + list("﹘﹣－⸗"),
)
def test_every_hyphen_family_member(ch):
    # normstrngs.cpp:37-61 kHyphenPuncUnicodes, complete
    assert normalize_text(f"a{ch}b") == "a-b"


@pytest.mark.parametrize("ch", list("`‘’‚‛′「＇"))
def test_every_single_quote_family_member(ch):
    assert normalize_text(f"x{ch}") == "x'"


@pytest.mark.parametrize(
    "ch", list("“”‟″„〝〞＂")
)
def test_every_double_quote_family_member(ch):
    # u_mode none isolates OCRNormalize: under NFKC the reference itself
    # first decomposes ″ (U+2033) into two primes, which then OCR-map to
    # '' — normalization order is normal form FIRST (normstrngs.cpp:134)
    assert normalize_text(f"x{ch}", u_mode="none") == 'x"'


def test_double_prime_decomposes_under_nfkc():
    # the reference's own pipeline order: NFKC(″) = ′′ -> ''
    assert normalize_text("x″") == "x''"


def test_zero_width_marks_always_dropped(spark):
    # normstrngs.cpp:128-131 — ZWSP/LRM/RLM/U+FFFD skipped in all modes
    assert one(spark, "a​b‎c‏d�e", strip_zero_width) == (
        "abcde"
    )
    assert normalize_text("a​b‎c", ocr=False) == "abc"


def test_no_lonely_joiners_nonalpha(spark):
    # normstrngs_test.cc:153 NoLonelyJoinersNonAlpha — letterless strings
    # lose their joiners
    assert one(spark, "‍+‌‍", strip_joiners_nonletter) == "+"
    assert normalize_text("‍+‌‍", ocr=False) == "+"


def test_joiners_stay_in_arabic(spark):
    # normstrngs_test.cc:166 JoinersStayInArabic — shaping joiners between
    # letters are meaningful and stay
    s = "ب‌ب‍ب"
    assert one(spark, s, strip_joiners_nonletter) == s
    assert normalize_text(s, ocr=False) == s


def test_fullwidth_to_halfwidth(spark):
    # normstrngs.cpp:289-310, incl. the FF5F/FF60 white-parens specials
    assert one(spark, "Ａｂ３", fullwidth_to_halfwidth) == "Ab3"
    assert one(spark, "　", fullwidth_to_halfwidth) == " "
    assert (
        one(spark, "｟x｠", fullwidth_to_halfwidth) == "⦅x⦆"
    )


def test_interchange_valid(spark):
    # normstrngs.cpp:268-281 — C0/C1 controls except HT LF FF CR, and BMP
    # noncharacters, are removed
    assert one(spark, "a\x07b\x00c", interchange_clean) == "abc"
    assert one(spark, "a\tb\nc\fd\re", interchange_clean) == "a\tb\nc\fd\re"
    assert one(spark, "a﷐b￾c", interchange_clean) == "abc"


def test_normalize_series_vectorized():
    s = pd.Series(["‘Hi’", "ﬁn", "a​b"])
    out = normalize_series(s).tolist()
    assert out == ["'Hi'", "fin", "ab"]


def test_composed_pipeline_column(spark):
    dirty = "“quick—fox”​Ａ\x07"
    assert one(spark, dirty, normalize_col) == '"quick-fox"A'
