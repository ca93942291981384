"""Spark end-to-end: corpus -> ocr_documents -> span-sequence equality.

The distributed analogue of BasicTesseractTest golden equality
(unittest/baseapi_test.cc:72-89) over the whole t1 corpus, plus plan-shape
assertions (partitioning, pushdown) for the scale contract.
"""

import pytest
from pyspark.sql import functions as F

from tesseract_spark.fixtures import DICT_WORDS
from tesseract_spark.pipeline import assemble_spans, ocr_documents


@pytest.fixture(scope="module")
def result(spark, corpus):
    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    flat = ocr_documents(
        spark, docs, media, dict_words=DICT_WORDS, num_partitions=16
    )
    return flat.cache()


def test_span_sequence_equality(spark, corpus, result):
    golden = spark.read.parquet(corpus["golden_spans"])
    got = assemble_spans(result)
    # exact tuple-sequence equality per doc (kind, text, media_ref, offset)
    joined = got.alias("g").join(golden.alias("e"), "doc_id", "full")
    mism = joined.filter(
        ~F.col("g.spans").eqNullSafe(F.col("e.spans"))
    )
    bad = mism.select("doc_id").collect()
    assert bad == [], f"span mismatch for docs: {[r.doc_id for r in bad][:5]}"


def test_all_docs_present(spark, corpus, result):
    n_docs = result.select("doc_id").distinct().count()
    assert n_docs == corpus["n_docs"]


def test_offsets_dense_and_ordered(result):
    chk = (
        result.groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.count_distinct("offset").alias("d"),
        )
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1) | (F.col("d") != F.col("n")))
    )
    assert chk.count() == 0


def test_confidence_populated_for_ocr_text(result):
    ocr_text = result.filter(
        (F.col("kind") == "text") & (F.col("partition_id") >= 0) & (F.col("n_words") > 0)
    )
    assert ocr_text.filter((F.col("confidence") <= 0) | (F.col("confidence") > 100)).count() == 0


def test_metrics_cover_partitions(result):
    # per-partition lineage signal exists (wall_ms, partition_id)
    parts = result.filter(F.col("partition_id") >= 0).select("partition_id").distinct()
    assert parts.count() >= 1


def test_plan_has_salted_exchange_and_pruned_scan(spark, corpus):
    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    flat = ocr_documents(spark, docs, media, num_partitions=8)
    plan = flat._jdf.queryExecution().executedPlan().toString().lower()
    # explicit single-pass salted hash exchange feeding the OCR stage
    assert "hashpartitioning(media_ref" in plan
    assert "repartition_by_num" in plan
    assert "mapinpandas" in plan
    # column pruning reaches the media scan: png/dpi only, not width/height
    assert "readschema: struct<media_ref:string,png:binary,dpi:int>" in plan


def test_bucketed_media_join_identical_and_shuffle_free(spark):
    """ocr_production_bucketed: identical output, and the bucketed media
    scan satisfies the join distribution (no exchange above the png
    side — the 100TB-scale shape where the payload never shuffles)."""
    from tesseract_spark.derived import ocr_production, ocr_production_bucketed

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, ocr_production(spark, sf).collect()))
    bdf = ocr_production_bucketed(spark, sf)
    b = sorted(map(tuple, bdf.collect()))
    assert a == b
    plan = bdf._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan
