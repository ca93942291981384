"""Per-partition lineage + OCR metrics, and checkpoint-resumable runs.

BASELINE.json: "persists per-partition lineage and OCR metrics (chars/sec,
line counts, confidence histograms) to enable checkpoint-resumable
restarts".  The reference's analogue is the ETEXT_DESC progress monitor
(include/tesseract/ocrclass.h; control.cpp:304-323) — here each Spark task
contributes metric columns on its output rows, which aggregate into a
lineage table; restarts anti-join completed documents, so re-running the
same (run_id, output) is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import ocr_documents
from . import catalog


def lineage_of(flat: DataFrame, run_id: str) -> DataFrame:
    """Aggregate per-partition lineage from the flat OCR span output.

    Failed pages (n_chars = -1 degraded markers) are surfaced in their
    own n_failed counter and EXCLUDED from the char/throughput/confidence
    stats — otherwise the QA metrics would misreport exactly the pages
    they exist to expose (negative char sums, phantom conf_0_10 mass)."""
    ocr_rows = flat.filter(F.col("partition_id") >= 0)
    ok = F.col("n_chars") >= 0
    return ocr_rows.groupBy("partition_id").agg(
        F.lit(run_id).alias("run_id"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum(ok.cast("long")).alias("n_spans"),
        F.sum((~ok).cast("long")).alias("n_failed"),
        F.sum(F.when(ok, F.col("n_lines")).otherwise(0)).alias("n_lines"),
        F.sum(F.when(ok, F.col("n_chars")).otherwise(0)).alias("n_chars"),
        F.round(
            F.sum(F.when(ok, F.col("wall_ms")).otherwise(0)) / 1000.0, 3
        ).alias("wall_s"),
        F.round(
            F.sum(F.when(ok, F.col("n_chars")).otherwise(0))
            / F.greatest(
                F.sum(F.when(ok, F.col("wall_ms")).otherwise(0)) / 1000.0,
                F.lit(1e-9),
            ),
            1,
        ).alias("chars_per_sec"),
        # confidence histogram: counts in 10 deciles (0-10, 10-20, ... 90-100)
        *[
            F.sum(
                F.when(
                    ok
                    & (F.col("confidence") >= b * 10)
                    & (F.col("confidence") < (b + 1) * 10 + (1 if b == 9 else 0)),
                    1,
                ).otherwise(0)
            ).alias(f"conf_{b*10}_{b*10+10}")
            for b in range(10)
        ],
        F.lit("complete").alias("status"),
    )


def run_with_resume(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    results_table: str,
    lineage_table: str,
    run_id: str,
    dict_words: list[str] | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Checkpoint-resumable OCR run.

    Documents whose doc_id already exists in results_table are skipped
    (anti-join); new results and lineage rows are appended.  Returns a
    summary dict {total, skipped, processed}.
    """
    total = docs.count()
    existing = catalog.read_table(spark, results_table)
    if existing is not None:
        done = existing.select("doc_id").distinct()
        todo = docs.join(done, "doc_id", "left_anti")
    else:
        todo = docs
    n_todo = todo.count()
    if n_todo:
        flat = ocr_documents(
            spark, todo, media, dict_words=dict_words, num_partitions=num_partitions
        ).cache()
        # materialize BEFORE appending: the anti-join against results_table
        # lists files lazily, so writing results first would make any
        # re-evaluation of `flat` see its own output and collapse to empty.
        flat.count()
        catalog.append_table(lineage_of(flat, run_id), lineage_table)
        catalog.append_table(flat, results_table)
        flat.unpersist()
    return {"total": total, "skipped": total - n_todo, "processed": n_todo}
