"""Symbol-level choice surface: ChoiceIterator / lstm_choice_mode.

Ports the semantics of ChoiceIterator (ltrresultiterator.cpp:368-490:
confidence-sorted alternatives, spaces filtered), SaveMostCertainChoices
(recodebeam.cpp:137-160: every output with probability >= 0.01), and the
lstm_choice_mode=2 hOCR emission (hocrrenderer.cpp:354-374).
"""

from pyspark.sql import functions as F

from tesseract_spark.functions.compose import PageSpec, compose_page
from tesseract_spark.lstm.ctc import K_CHOICE_MIN_P, K_CHOICE_TOP_K
from tesseract_spark.operators.recognize import recognize_page_detail


def _page_words(text: str):
    page = compose_page(PageSpec(paragraphs=[[text]]))
    _spans, words, _l = recognize_page_detail(
        page.image, 300, want_choices=True
    )
    return words


def test_rank1_choice_is_decoded_char():
    for w in _page_words("the quick brown fox"):
        assert len(w.choices) == len(w.text)
        for ch, sym in zip(w.text, w.choices):
            assert sym, "every decoded symbol has at least one choice"
            assert sym[0][0] == ch


def test_choices_sorted_desc_and_thresholded():
    for w in _page_words("sphinx of black quartz"):
        for sym in w.choices:
            confs = [c for _ch, c in sym]
            assert confs == sorted(confs, reverse=True)
            assert all(c >= K_CHOICE_MIN_P * 100.0 for c in confs)
            assert len(sym) <= K_CHOICE_TOP_K


def test_space_and_blank_never_choices():
    for w in _page_words("a b c d"):
        for sym in w.choices:
            assert all(ch != " " for ch, _c in sym)


def test_alternatives_exist_for_confusable_glyphs():
    # at least one symbol somewhere should carry > 1 choice (confusable
    # shapes like o/c/e share template ink)
    n_alts = sum(
        len(sym) > 1 for w in _page_words("commonwealth observers")
        for sym in w.choices
    )
    assert n_alts > 0


def test_hocr_choice_mode(spark, corpus):
    from tesseract_spark.operators.sinks import ocr_words, to_hocr

    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    words = ocr_words(spark, docs, media).filter(F.col("word_num") >= 0)
    # default mode: no choice spans
    plain = to_hocr(words).limit(1).collect()[0]["hocr"]
    assert "ocrx_cinfo" not in plain
    h = to_hocr(words, lstm_choice_mode=2).limit(1).collect()[0]["hocr"]
    assert "ocrx_cinfo" in h and "x_confs" in h
    # well-formed nesting: every open span closes
    assert h.count("<span") == h.count("</span>")


def test_words_schema_choices_column(spark, corpus):
    from tesseract_spark.operators.sinks import ocr_words

    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    row = (
        ocr_words(spark, docs, media)
        .filter(F.col("word_num") >= 0)
        .select("text", "choices")
        .first()
    )
    assert len(row["choices"]) == len(row["text"])
    assert row["choices"][0][0]["ch"] == row["text"][0]


# ---------------------------------------------------------------------------
# GetComponentImages family (baseapi.h:350-426)


def test_component_images_levels(spark, corpus):
    import numpy as np

    from tesseract_spark.functions.png_codec import decode_gray_png
    from tesseract_spark.operators.sinks import to_component_images

    media = spark.read.parquet(corpus["media"]).limit(4).cache()
    lines = to_component_images(media, level="textline").collect()
    words = to_component_images(media, level="word").collect()
    blocks = to_component_images(media, level="block").collect()
    assert len(blocks) >= 1
    assert len(lines) >= len(blocks)  # every block has >= 1 line
    assert len(words) >= len(lines)  # every line has >= 1 word
    # crops decode and match their declared bbox
    for r in lines[:5]:
        img = decode_gray_png(bytes(r["png"]))
        assert img.shape == (r["height"], r["width"])
        assert isinstance(img, np.ndarray)
    # word rows carry full id chain
    assert all(r["word_num"] >= 1 and r["line_num"] >= 1 for r in words)


def test_component_images_rejects_bad_level(spark, corpus):
    import pytest

    from tesseract_spark.operators.sinks import to_component_images

    media = spark.read.parquet(corpus["media"])
    with pytest.raises(ValueError):
        to_component_images(media, level="symbol")
