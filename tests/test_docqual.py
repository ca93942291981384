"""Quality-based rejection (docqual.cpp:51-320 + control.cpp:663-681)."""

from pyspark.sql import functions as F

from tesseract_spark.operators.docqual import (
    doc_quality_stats,
    quality_based_rejection,
)

WORD_COLS = (
    "doc_id string, media_ref string, block_num int, par_num int, "
    "line_num int, word_num int, left int, top int, width int, height int, "
    "conf double, text string"
)


def _w(doc, ref, block, wn, conf, text):
    return (doc, ref, block, 1, 1, wn, 0, 0, 10, 10, conf, text)


def test_doc_quality_gate(spark):
    rows = [
        # good page: all high conf
        _w("d1", "m1", 1, 1, 90.0, "hello"),
        _w("d1", "m1", 1, 2, 85.0, "world"),
        # bad page: most chars rejected
        _w("d2", "m2", 1, 1, 20.0, "garbage"),
        _w("d2", "m2", 1, 2, 30.0, "noise"),
        _w("d2", "m2", 1, 3, 90.0, "ok"),
    ]
    df = spark.createDataFrame(rows, WORD_COLS)
    stats = {r.media_ref: r for r in doc_quality_stats(df).collect()}
    assert stats["m1"].good_quality_doc
    assert stats["m1"].rej_count == 0 and stats["m1"].char_quality == 10
    assert not stats["m2"].good_quality_doc
    assert stats["m2"].rej_count == 12  # 'garbage' + 'noise' chars
    # degraded markers are excluded from the tallies
    rows_m = rows + [_w("d1", "m1", -1, -1, -1.0, "")]
    stats2 = {r.media_ref: r for r in doc_quality_stats(
        spark.createDataFrame(rows_m, WORD_COLS)).collect()}
    assert stats2["m1"].char_count == stats["m1"].char_count


def test_block_rejection_on_bad_page(spark):
    """On a NOT-good page, a block over the 45% reject rate loses all
    its words; a clean block on the same page survives; the same block
    mix on a good-quality page is spared block rejection."""
    rows = [
        # page p1: block 1 is 100% rejects, block 2 clean; overall page
        # rejects > 8% -> not good_quality_doc, but < 65% -> no page rej
        _w("d1", "p1", 1, 1, 10.0, "zzz"),
        _w("d1", "p1", 1, 2, 95.0, "ok"),  # innocent word in bad block
        _w("d1", "p1", 2, 1, 95.0, "clean words here"),
        _w("d1", "p1", 2, 2, 95.0, "and more clean text"),
    ]
    df = spark.createDataFrame(rows, WORD_COLS)
    out = {(r.block_num, r.word_num): r.rejected
           for r in quality_based_rejection(df).collect()}
    assert out[(1, 1)]  # rejected by own conf
    # block 1 reject rate = 3/5 = 60% > 45% on a bad page: innocent word
    # rejected too
    assert out[(1, 2)]
    assert not out[(2, 1)] and not out[(2, 2)]


def test_whole_page_rejection(spark):
    rows = [
        _w("d1", "p1", 1, 1, 10.0, "aaaa"),
        _w("d1", "p1", 1, 2, 10.0, "bbbb"),
        _w("d1", "p1", 2, 1, 95.0, "ok"),  # clean block, but page > 65% rej
    ]
    df = spark.createDataFrame(rows, WORD_COLS)
    out = quality_based_rejection(df)
    assert all(r.rejected for r in out.collect())


def test_unlv_with_quality_rejection(spark):
    """A bad block's innocent word tilde-crunches under the docqual pass
    but survives plain confidence-based UNLV marking."""
    from tesseract_spark.operators.sinks import to_unlv

    rows = [
        _w("d1", "p1", 1, 1, 10.0, "zzz"),
        _w("d1", "p1", 1, 2, 95.0, "ok"),
        _w("d1", "p1", 2, 1, 95.0, "clean words here"),
        _w("d1", "p1", 2, 2, 95.0, "and more clean text"),
    ]
    df = spark.createDataFrame(rows, WORD_COLS)
    plain = to_unlv(df).collect()[0].unlv
    crunched = to_unlv(df, quality_rejection=True).collect()[0].unlv
    assert "ok" in plain  # confidence alone keeps the innocent word
    assert "ok" not in crunched  # block rejection crunches it
    assert "clean words here" in crunched  # the clean block survives
