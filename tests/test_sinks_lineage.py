"""Sinks (text/TSV/hOCR/ALTO) + lineage/checkpoint-resume tests."""

import pytest
from pyspark.sql import functions as F

from tesseract_spark.operators.sinks import (
    ocr_words,
    to_alto,
    to_hocr,
    to_text,
    to_tsv,
)
from tesseract_spark.pipeline import ocr_documents
from tesseract_spark.sources.lineage import lineage_of, run_with_resume


@pytest.fixture(scope="module")
def dfs(spark, corpus):
    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    return docs, media


@pytest.fixture(scope="module")
def words(spark, dfs):
    docs, media = dfs
    return ocr_words(spark, docs, media).cache()


def test_words_have_valid_boxes(words):
    bad = words.filter(
        (F.col("width") <= 0) | (F.col("height") <= 0)
        | (F.col("conf") < 0) | (F.col("conf") > 100) | (F.col("text") == "")
    )
    assert words.count() > 0 and bad.count() == 0


def test_tsv_levels(words):
    tsv = to_tsv(words)
    levels = {r.level for r in tsv.select("level").distinct().collect()}
    assert levels == {1, 2, 3, 4, 5}
    row = tsv.filter(F.col("level") == 5).first()
    assert len(row.tsv.split("\t")) == 12


def test_hocr_structure(words):
    # baseapi_test.cc:122-158 analogue: structural substrings present
    h = to_hocr(words).first().hocr
    for marker in ("ocr_page", "ocr_carea", "ocr_par", "ocr_line",
                   "ocrx_word", "x_wconf", "bbox "):
        assert marker in h


def test_alto_structure(words):
    a = to_alto(words).first().alto
    for marker in ("<alto>", "<TextBlock>", "<TextLine>", "<String ", "CONTENT="):
        assert marker in a


def test_to_text_assembles_paragraphs(spark, dfs):
    docs, media = dfs
    flat = ocr_documents(spark, docs, media, num_partitions=8)
    txt = to_text(flat)
    assert txt.count() > 0
    assert txt.filter(F.length("text") > 0).count() > 0


def test_lineage_metrics(spark, dfs):
    docs, media = dfs
    flat = ocr_documents(spark, docs.limit(10), media, num_partitions=4)
    lin = lineage_of(flat, "run-test").toPandas()
    assert (lin["status"] == "complete").all()
    assert (lin["chars_per_sec"] > 0).all()
    hist_cols = [c for c in lin.columns if c.startswith("conf_")]
    assert len(hist_cols) == 10
    # histogram counts spans with words; every bucketed span is counted once
    assert lin[hist_cols].to_numpy().sum() <= lin["n_spans"].sum()


def test_checkpoint_resume(spark, dfs, tmp_path):
    docs, media = dfs
    results = str(tmp_path / "results")
    lineage = str(tmp_path / "lineage")
    has_media = docs.filter(
        F.size(F.filter("spans", lambda s: s["kind"] == "media")) > 0
    )
    sub = has_media.limit(12).cache()
    first = run_with_resume(
        spark, sub.limit(5), media, results, lineage, "run-1", num_partitions=4
    )
    assert first["processed"] == 5 and first["skipped"] == 0
    second = run_with_resume(
        spark, sub, media, results, lineage, "run-2", num_partitions=4
    )
    assert second["skipped"] == 5 and second["processed"] == 7
    out = spark.read.parquet(results)
    assert out.select("doc_id").distinct().count() == 12
    lin = spark.read.parquet(lineage)
    assert {r.run_id for r in lin.select("run_id").distinct().collect()} == {
        "run-1",
        "run-2",
    }


def test_page_xml_structure(words):
    from tesseract_spark.operators.sinks import to_page_xml

    x = to_page_xml(words).first().page_xml
    for marker in ("<PcGts>", "<ReadingOrder>", "RegionRefIndexed",
                   "<TextRegion", "<TextLine>", "<Word>", "<Coords",
                   "<TextEquiv>"):
        assert marker in x


def test_box_format(words, spark, corpus):
    from tesseract_spark.operators.sinks import to_box

    media = spark.read.parquet(corpus["media"]).select(
        "media_ref", F.col("height").alias("height_px")
    )
    box = to_box(words, media)
    row = box.first()
    parts = row.box_line.split(" ")
    assert parts[0] == "WordStr" and parts[5] == "0"
    assert int(parts[1]) >= 0 and int(parts[3]) > int(parts[1])
    assert "#" in row.box_line


def test_xml_sinks_escape_quotes(spark):
    """The charset includes ' and \" — attribute values (ALTO CONTENT) and
    element text must be XML-escaped (HOcrEscape, baseapi.cpp:2240)."""
    import xml.etree.ElementTree as ET

    from tesseract_spark.operators.sinks import to_alto, to_hocr, to_page_xml

    rows = [
        ("d", "m", 1, 1, 1, 1, 0, 0, 10, 10, 95.0, 'say "hi"'),
        ("d", "m", 1, 1, 1, 2, 20, 0, 10, 10, 95.0, "it's<&>fine"),
    ]
    words = spark.createDataFrame(
        rows,
        "doc_id string, media_ref string, block_num int, par_num int,"
        " line_num int, word_num int, left int, top int, width int,"
        " height int, conf double, text string",
    )
    alto = to_alto(words).first().alto
    ET.fromstring(alto)  # must parse
    assert "&quot;hi&quot;" in alto and "&apos;" in alto
    page = to_page_xml(words).first().page_xml
    ET.fromstring(page.split("?>")[-1]) if "?>" in page else ET.fromstring(page)
    hocr = to_hocr(words).first().hocr
    assert "&lt;" in hocr and "&amp;" in hocr


def test_box_chars_symbol_records(spark, corpus):
    """GetBoxText analogue: per-symbol boxes split the word box at the
    font's own advances — on this engine's renderer the recovered char
    boxes match the glyph advances exactly."""
    from pyspark.sql import functions as F

    from tesseract_spark.functions.fonts import KERN, glyph_width
    from tesseract_spark.operators.sinks import ocr_words, to_box_chars

    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    words = ocr_words(spark, docs, media).cache()
    boxes = to_box_chars(words)
    some = words.filter(
        (F.length("text") >= 3) & (F.col("word_num") >= 1)
    ).limit(1).collect()[0]
    recs = [
        r.box_line.split(" ")
        for r in boxes.filter(
            (F.col("doc_id") == some.doc_id)
            & (F.col("media_ref") == some.media_ref)
        ).collect()
    ]
    # reconstruct this word's char boxes: chars in order at its y-band
    mine = [r for r in recs if int(r[2]) == some.top and
            some.left <= int(r[1]) < some.left + some.width]
    text = "".join(r[0] for r in mine)
    assert some.text in text  # the word's chars all present, in order
    # char boxes partition the word: first starts at word left, widths
    # follow the font advances (scale 1 words)
    w_adv = sum(glyph_width(c) for c in some.text) + KERN * (len(some.text) - 1)
    if some.width == w_adv:  # scale-1 exact case
        sub = [r for r in mine if r[0] in some.text]
        first = next(r for r in sub if int(r[1]) == some.left)
        assert int(first[3]) - int(first[1]) == glyph_width(first[0])
    # every line has 6 fields and integer coords
    for r in recs:
        assert len(r) == 6 and r[5] == "0"
        int(r[1]), int(r[2]), int(r[3]), int(r[4])


def test_hocr_contains_baseline(spark, corpus):
    """HOCRContainsBaseline (baseapi_test.cc:139-158): ocr_line titles
    must match `baseline [-.0-9]+ [-.0-9]+`."""
    import re

    from tesseract_spark.operators.sinks import ocr_words, to_hocr

    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    hocr = to_hocr(ocr_words(spark, docs, media)).first().hocr
    m = re.search(r'class="ocr_line"[^>]*baseline ([-.0-9]+) ([-.0-9]+)', hocr)
    assert m, hocr[:400]
    # offset is baseline-to-bbox-bottom: small negative (descender rows)
    assert -8 <= int(m.group(2)) <= 0


def test_lstm_box_format(spark, corpus):
    """GetLSTMBoxText contract: every symbol row carries its line's box
    (bottom-up y, right+5), spaces are records too, a tab record ends
    each line."""
    from pyspark.sql import functions as F

    from tesseract_spark.operators.sinks import ocr_words, to_lstm_box

    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    heights = media.select("media_ref", F.col("height").alias("height_px"))
    words = ocr_words(spark, docs, media)
    rec = to_lstm_box(words, page_heights=heights).first()
    rows = rec.lstm_box.split("\n")
    assert rows[-1].startswith("\t ")  # line-end tab record
    # every record (symbol, space, tab) carries the same LINE box:
    # compare the last 5 space-separated fields
    boxes = {tuple(r.split(" ")[-5:]) for r in rows}
    assert len(boxes) == 1
    fields = rows[0].split(" ")[-5:]
    assert fields[4] == "0"
    l, yb, r, yt = map(int, fields[:4])
    assert r > l and yt > yb >= 0  # bottom-up page frame


def test_to_text_ptistexttype_contract(spark):
    """GetUTF8Text includes ONLY text-type spans (PTIsTextType,
    publictypes.h:80-85): display equations (PT_EQUATION is not a text
    type — the reference recognizes no words there) and media stay out;
    inline equations live inside text spans and come through."""
    flat = spark.createDataFrame(
        [
            (1, "text", None, 0, "prose with 12+34=46 inline"),
            (1, "equation", None, 1, "12+34=46 12<46"),
            (1, "media", "m1", 2, ""),
            (1, "text", None, 3, "closing prose"),
        ],
        "doc_id long, kind string, media_ref string, offset int, text string",
    )
    out = {r.doc_id: r.text for r in to_text(flat).collect()}
    assert out[1] == "prose with 12+34=46 inline\n\nclosing prose"
