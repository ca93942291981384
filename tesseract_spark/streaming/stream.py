"""Structured Streaming front-end for the OCR pipeline.

The reference's closest concepts (SURVEY §2.9): multipage/file-list
streaming with per-page rendering callbacks (baseapi.cpp:878-998) and the
ETEXT_DESC progress monitor.  Here:

- ``stream_ocr``: file-source stream over the documents table; each
  micro-batch runs the full batch pipeline via ``foreachBatch`` and appends
  to the results table — ``availableNow`` gives run-to-completion semantics
  with checkpointed file progress, and per-batch_id overwrite directories
  make the output idempotent under micro-batch replay (the resumability
  story of BASELINE.json, expressed with Spark's own checkpoint
  mechanism).
- ``stream_event_counts``: watermarked tumbling-window aggregation (the
  late-data-tolerant rollup pattern) over an event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipeline import SPAN_STRUCT, ocr_documents

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)


def stream_ocr(
    spark: SparkSession,
    docs_dir: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    dict_words: list[str] | None = None,
    num_partitions: int | None = None,
):
    """Stream documents parquet dir -> OCR -> append parquet results.

    Returns the finished StreamingQuery (availableNow: processes everything
    present, then stops; re-running skips checkpointed files).
    """
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(docs_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        flat = ocr_documents(
            spark, batch_df, media, dict_words=dict_words,
            num_partitions=num_partitions,
        )
        # idempotent per-batch output: a driver failure between the write
        # commit and the checkpoint commit replays the batch, and the
        # overwrite of the same batch_id directory absorbs the replay
        # (plain append would duplicate rows — at-least-once output)
        flat.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_event_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window event counts, run to completion against
    an in-memory sink; returns the result DataFrame."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "value_sum")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("event_counts")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("event_counts")


def stream_assemble_documents(
    spark: SparkSession,
    spans_dir: str,
    checkpoint_dir: str,
    query_name: str = "assembled_docs",
    max_files_per_trigger: int = 1,
    out_dir: str | None = None,
) -> DataFrame:
    """Custom stateful operator: incremental document assembly.

    Span fragments of a document arrive across micro-batches (the
    streaming analogue of the reference's multipage progressive output:
    TessResultRenderer BeginDocument/AddImage/EndDocument,
    src/api/renderer.cpp:92-135, where a document is complete only after
    every page has been appended).  Per-document state accumulates
    (pos, kind, text) fragments via ``applyInPandasWithState``; when the
    declared span count is reached the assembled, position-ordered
    document is emitted exactly once and its state is dropped.

    Input rows: (doc_id string, pos int, kind string, text string,
    n_spans int) — ``n_spans`` is the document's total span count
    (repeated on each fragment; the page count a multipage container
    header declares).

    Sinks: with ``out_dir`` the query appends completed documents to
    parquet via foreachBatch and RESUMES from the checkpoint across runs
    (per-group state survives restarts — the checkpoint-resumable story
    of BASELINE.json applied to streaming state); without it, a memory
    sink for ad-hoc inspection (memory sinks cannot recover a
    checkpoint, so pass a fresh checkpoint_dir per run in that mode).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("pos", T.IntegerType()),
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_spans", T.IntegerType()),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_spans", T.IntegerType()),
            T.StructField("n_text", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("pos", T.ArrayType(T.IntegerType())),
            T.StructField("kind", T.ArrayType(T.StringType())),
            T.StructField("text", T.ArrayType(T.StringType())),
            T.StructField("n", T.IntegerType()),
        ]
    )

    def assemble(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            pos, kind, text, n = state.get
            pos, kind, text = list(pos), list(kind), list(text)
        else:
            pos, kind, text, n = [], [], [], -1
        for pdf in pdfs:
            for r in pdf.itertuples():
                # nullable ints arrive as NaN through pandas — a bad
                # fragment must not kill every document's assembly
                if pd.isna(r.pos) or pd.isna(r.kind):
                    continue
                pos.append(int(r.pos))
                kind.append(str(r.kind))
                text.append("" if pd.isna(r.text) else str(r.text))
                if not pd.isna(r.n_spans) and int(r.n_spans) > 0:
                    n = int(r.n_spans)
        if 0 < n <= len(pos):
            order = sorted(range(len(pos)), key=lambda i: pos[i])
            doc = "\n".join(text[i] for i in order if kind[i] == "text")
            n_text = sum(1 for i in order if kind[i] == "text")
            state.remove()  # EndDocument: emit once, drop state
            yield pd.DataFrame(
                {
                    "doc_id": [key[0]],
                    "n_spans": [n],
                    "n_text": [n_text],
                    "text": [doc],
                }
            )
        else:
            state.update((pos, kind, text, n))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(spans_dir)
    )
    assembled = stream.groupBy("doc_id").applyInPandasWithState(
        assemble,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    if out_dir is not None:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            assembled.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import os

        if not os.path.exists(out_dir):  # zero batches ever emitted
            return spark.createDataFrame([], out_schema)
        return spark.read.parquet(out_dir)
    q = (
        assembled.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_dedup_exact(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str | None = None,
    query_name: str = "stream_dedup",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming exact deduplication with checkpoint-resumable state.

    The training-data-pipeline exact dedup (q_dedup_exact's hash-groupBy)
    lifted onto the streaming surface: documents arrive across
    micro-batches, are keyed by content fingerprint (sha2 over the
    whitespace-normalized text), and flow through
    ``applyInPandasWithState``.  The FIRST document seen for a
    fingerprint is emitted as canonical (``dup_of`` NULL); every later
    arrival — same batch, later batch, or a later RUN resumed from the
    checkpoint — emits a (doc_id, dup_of=canonical) mapping row instead.
    Per-fingerprint state is one short string (the canonical doc_id), so
    state size is O(unique corpus) regardless of stream length, and the
    state store shards by fingerprint hash — no skew from popular
    documents beyond their single state entry.

    Within one batch, the smallest doc_id wins canonical (deterministic
    under shuffle nondeterminism); across batches, arrival order wins
    (streaming semantics).

    Input rows: (doc_id string, text string).
    Output rows: (doc_id string, fp string, dup_of string|null).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    in_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("fp", T.StringType()),
            T.StructField("dup_of", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("canonical", T.StringType())]
    )

    def dedup(key, pdfs, state: GroupState):
        import pandas as pd

        canonical = state.get[0] if state.exists else None
        rows = []
        ids: list[str] = []
        for pdf in pdfs:
            ids.extend(str(d) for d in pdf["doc_id"] if not pd.isna(d))
        ids.sort()
        for d in ids:
            if canonical is None:
                canonical = d
                rows.append({"doc_id": d, "fp": key[0], "dup_of": None})
            else:
                rows.append({"doc_id": d, "fp": key[0], "dup_of": canonical})
        state.update((canonical,))
        if rows:
            yield pd.DataFrame(rows, columns=["doc_id", "fp", "dup_of"])

    stream = (
        spark.readStream.schema(in_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .withColumn(
            "fp",
            F.sha2(
                F.regexp_replace(F.coalesce("text", F.lit("")), r"\s+", " "),
                256,
            ),
        )
    )
    deduped = stream.groupBy("fp").applyInPandasWithState(
        dedup,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    if out_dir is not None:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            deduped.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import os

        if not os.path.exists(out_dir):
            return spark.createDataFrame([], out_schema)
        return spark.read.parquet(out_dir)
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
