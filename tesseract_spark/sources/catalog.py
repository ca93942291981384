"""Table I/O: Iceberg ``writeTo`` with a parquet-path fallback.

The production target is an Iceberg catalog (BASELINE.json: "writes results
back to Iceberg"); the sandbox has no Iceberg runtime, so identifiers
containing a path separator fall back to parquet-directory semantics with
the same append/overwrite contract (SURVEY §7.4 risk 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_path(identifier: str) -> bool:
    return "/" in identifier or identifier.startswith(".")


def append_table(df: DataFrame, identifier: str) -> None:
    if is_path(identifier):
        df.write.mode("append").parquet(identifier)
    else:
        df.writeTo(identifier).append()


def overwrite_table(df: DataFrame, identifier: str) -> None:
    if is_path(identifier):
        df.write.mode("overwrite").parquet(identifier)
    else:
        df.writeTo(identifier).createOrReplace()


def read_table(spark: SparkSession, identifier: str) -> DataFrame | None:
    """Returns None ONLY when the table/path does not exist.

    Any other failure (corrupt footer, permission blip, concurrent
    writer) propagates: treating it as "absent" would make
    run_with_resume reprocess everything and append duplicates —
    resumability must fail loudly rather than silently double-write.
    """
    from pyspark.errors import AnalysisException

    try:
        if is_path(identifier):
            return spark.read.parquet(identifier)
        return spark.read.table(identifier)
    except AnalysisException as e:
        cond = getattr(e, "getErrorClass", lambda: None)() or ""
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in cond
            or "TABLE_OR_VIEW_NOT_FOUND" in cond
            or "PATH_NOT_FOUND" in msg
            or "TABLE_OR_VIEW_NOT_FOUND" in msg
            or "Path does not exist" in msg
        ):
            return None
        raise
