"""Structured Streaming front-end for the OCR pipeline.

The reference's closest concepts (SURVEY §2.9): multipage/file-list
streaming with per-page rendering callbacks (baseapi.cpp:878-998) and the
ETEXT_DESC progress monitor.  Here:

- ``stream_ocr``: file-source stream over the documents table; each
  micro-batch runs the full batch pipeline via ``foreachBatch`` and appends
  to the results table — ``availableNow`` gives run-to-completion semantics
  with checkpointed exactly-once file progress (the resumability story of
  BASELINE.json, expressed with Spark's own checkpoint mechanism).
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
        flat.write.mode("append").parquet(out_dir)

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
