"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``    — flagship OCR extraction on sf0.001 (smoke check).
- ``queries()``       — one entry per implemented operator (SURVEY.md §2):
                        the OCR pipeline queries plus relational/training-
                        pipeline operator analogues, all over the sandbox
                        parquet tables.
- ``oracle_sql()``    — matching DuckDB SQL per query (the correctness
                        oracle); every registry entry has one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tesseract_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive the interleaved text+media corpus from sf0.001
    documents, render media spans, run the full OCR pipeline (Otsu -> CC ->
    deskew -> layout -> template-net + CTC beam decode), stitch ordered
    spans.  Returns the flat span DataFrame."""
    from tesseract_spark.derived import ocr_flagship

    return ocr_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every query (same column names)."""
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
