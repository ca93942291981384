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


def test_stateful_document_assembly(spark, tmp_path):
    """applyInPandasWithState: fragments arrive across micro-batches; a
    document is emitted exactly once, only when all its spans arrived
    (renderer BeginDocument/AddImage/EndDocument semantics)."""
    from tesseract_spark.streaming.stream import stream_assemble_documents

    rows1 = [  # first wave: d1 complete, d2 partial
        ("d1", 0, "text", "alpha", 2),
        ("d1", 1, "text", "beta", 2),
        ("d2", 2, "text", "last", 3),
        ("d2", 0, "text", "first", 3),
    ]
    rows2 = [  # second wave completes d2 (media span, out of order)
        ("d2", 1, "media", None, 3),
    ]
    schema = "doc_id string, pos int, kind string, text string, n_spans int"
    spans_dir = str(tmp_path / "spans_stream")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(spans_dir)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(spans_dir)
    res = stream_assemble_documents(
        spark, spans_dir, str(tmp_path / "cp_assemble"), query_name="asm1"
    )
    got = {r.doc_id: r for r in res.collect()}
    assert set(got) == {"d1", "d2"}
    assert got["d1"].text == "alpha\nbeta" and got["d1"].n_text == 2
    # d2: media span at pos 1 elided from text, order restored
    assert got["d2"].text == "first\nlast" and got["d2"].n_text == 2
    assert got["d2"].n_spans == 3


def test_stateful_assembly_incomplete_doc_not_emitted(spark, tmp_path):
    from tesseract_spark.streaming.stream import stream_assemble_documents

    rows = [("dX", 0, "text", "only", 5)]  # 1 of 5 spans present
    schema = "doc_id string, pos int, kind string, text string, n_spans int"
    spans_dir = str(tmp_path / "spans_stream2")
    spark.createDataFrame(rows, schema).write.parquet(spans_dir)
    res = stream_assemble_documents(
        spark, spans_dir, str(tmp_path / "cp_assemble2"), query_name="asm2"
    )
    assert res.count() == 0


def test_stateful_assembly_resumes_state_across_runs(spark, tmp_path):
    """Durable mode (foreachBatch parquet): per-doc state survives query
    restarts via the checkpoint; completion in a later run emits exactly
    once and re-runs emit nothing."""
    from tesseract_spark.streaming.stream import stream_assemble_documents

    schema = "doc_id string, pos int, kind string, text string, n_spans int"
    spans_dir = str(tmp_path / "spans3")
    cp = str(tmp_path / "cp3")
    out = str(tmp_path / "out3")
    spark.createDataFrame(
        [("dA", 0, "text", "one", 2)], schema
    ).coalesce(1).write.mode("append").parquet(spans_dir)
    res = stream_assemble_documents(spark, spans_dir, cp, out_dir=out)
    assert res.count() == 0  # incomplete, state persisted
    spark.createDataFrame(
        [("dA", 1, "text", "two", 2)], schema
    ).coalesce(1).write.mode("append").parquet(spans_dir)
    res = stream_assemble_documents(spark, spans_dir, cp, out_dir=out)
    rows = res.collect()
    assert len(rows) == 1 and rows[0].text == "one\ntwo"
    # idempotent re-run: checkpoint sees no new files
    res = stream_assemble_documents(spark, spans_dir, cp, out_dir=out)
    assert res.count() == 1


def test_stream_dedup_exact(spark, tmp_path):
    from tesseract_spark.streaming.stream import stream_dedup_exact

    docs_dir = str(tmp_path / "dd_docs")
    # batch 1: d1/d2 share text (d1 canonical by doc_id), d3 unique
    spark.createDataFrame(
        [("d1", "same text"), ("d2", "same  text"), ("d3", "other")],
        "doc_id string, text string",
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    out = str(tmp_path / "dd_out")
    cp = str(tmp_path / "dd_cp")
    got = stream_dedup_exact(spark, docs_dir, cp, out_dir=out).toPandas()
    got = got.set_index("doc_id")
    import pandas as pd

    assert pd.isna(got.loc["d1", "dup_of"])  # d1 is canonical
    # whitespace-normalized fingerprint: d2 maps to d1
    assert got.loc["d2", "dup_of"] == "d1"
    assert pd.isna(got.loc["d3", "dup_of"])
    # batch 2 (a later RUN resumed from the checkpoint): a new duplicate
    # of d1's text still maps to d1 -- state survived the restart
    spark.createDataFrame(
        [("d4", "same text"), ("d5", "fresh")],
        "doc_id string, text string",
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    got2 = stream_dedup_exact(spark, docs_dir, cp, out_dir=out).toPandas()
    got2 = got2.set_index("doc_id")
    assert got2.loc["d4", "dup_of"] == "d1"
    assert pd.isna(got2.loc["d5", "dup_of"])
    assert len(got2) == 5  # no re-emission of batch-1 rows


def test_stream_dedup_within_batch_deterministic_canonical(spark, tmp_path):
    from tesseract_spark.streaming.stream import stream_dedup_exact

    docs_dir = str(tmp_path / "dd2_docs")
    rows = [(f"x{i}", "dup me") for i in range(9, -1, -1)]
    spark.createDataFrame(rows, "doc_id string, text string").repartition(
        4
    ).write.parquet(docs_dir)
    got = stream_dedup_exact(
        spark, docs_dir, str(tmp_path / "dd2_cp"),
        out_dir=str(tmp_path / "dd2_out"), max_files_per_trigger=10,
    ).toPandas()
    canon = got[got.dup_of.isna()]
    assert list(canon.doc_id) == ["x0"]  # smallest doc_id wins in-batch
    assert (got[got.doc_id != "x0"].dup_of == "x0").all()
