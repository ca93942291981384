"""Structured Streaming tests: OCR foreachBatch with checkpointed resume,
and the watermarked tumbling-window aggregation."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tesseract_spark.streaming.stream import stream_event_counts, stream_ocr


def test_stream_ocr_matches_batch_and_checkpoints(spark, corpus, tmp_path):
    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    docs_dir = str(tmp_path / "docs_stream")
    docs.limit(12).repartition(3).write.parquet(docs_dir)
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    stream_ocr(spark, docs_dir, media, out, cp, num_partitions=4)
    got = spark.read.parquet(out)
    n1 = got.count()
    assert got.select("doc_id").distinct().count() == 12
    # re-run: checkpoint means no new files -> no new rows
    stream_ocr(spark, docs_dir, media, out, cp, num_partitions=4)
    assert spark.read.parquet(out).count() == n1


def test_stream_event_counts_matches_batch(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = "/root/testdata/sf0.001/events.parquet"
    events_dir = str(tmp_path / "events_stream")
    spark.read.parquet(src).write.parquet(events_dir)
    res = stream_event_counts(spark, events_dir, str(tmp_path / "cp2"))
    batch = duckdb.sql(
        f"""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) h, event_type,
            count(*) n FROM '{src}' GROUP BY 1, 2"""
    ).df()
    got = (
        res.select(F.col("hour_start").cast("string").alias("h"), "event_type", "n")
        .toPandas()
        .sort_values(["h", "event_type"])
        .reset_index(drop=True)
    )
    exp = batch.sort_values(["h", "event_type"]).reset_index(drop=True)
    exp["n"] = exp["n"].astype("int64")
    assert got.shape == exp.shape
    assert (got["n"].values == exp["n"].values).all()
    assert (got["h"].values == exp["h"].values).all()
