"""N vs 4N EXECUTOR scaling via spark-submit --py-files (the north rule's
literal deployment shape).

Unlike local[N] (one JVM, threads), Spark's local-cluster[E,C,M] master
launches E separate executor JVMs with C cores each — real executors,
real serialized shuffles between processes.  This script packages the
engine as engine.zip, submits the flagship OCR job with
``spark-submit --py-files engine.zip`` at N=1 and 4N=4 executors
(constant cores-per-executor, so per-executor resources match a real
cluster's), repeats interleaved (VM drift, see BENCH.md), and reports
throughput + scaling efficiency E = T_N / (4 * T_4N).

Usage: python submit_bench.py   -> writes SUBMIT_SCALING.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES_PER_EXEC = int(os.environ.get("SPARK_GRAFT_CORES_PER_EXEC", "2"))
EXEC_MEM_MB = 3072
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))

JOB = r"""
import os, time
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from tesseract_spark.derived import (
    materialize_corpus_bucketed,
    ocr_production_bucketed,
)
# the bucketed path is the production shape: with separate executor JVMs
# the png payload would otherwise serialize through a real shuffle --
# bucketing keeps it scan-local (see BENCH.md "Heavy-payload join")
materialize_corpus_bucketed(spark, os.environ["SPARK_GRAFT_SF_DIR"])  # idempotent
# untimed warmup: one full untimed pass of the job -- spins up every
# executor's python workers, imports + JITs the engine, and warms the OS
# page cache for the input parquet.  A real 1000-executor cluster runs for
# hours in steady state; the first-minutes ramp (worker fork, codegen,
# cold reads) is a fixed cost that would otherwise be charged against the
# scaling ratio.  Shuffle outputs are NOT reused across actions, so the
# timed pass re-executes every exchange and UDF for real.
warm = ocr_production_bucketed(spark, os.environ["SPARK_GRAFT_SF_DIR"]).count()
t0 = time.perf_counter()
n = ocr_production_bucketed(spark, os.environ["SPARK_GRAFT_SF_DIR"]).count()
wall = time.perf_counter() - t0
assert n == warm, (n, warm)
print(f"SUBMIT_RESULT rows={n} wall={wall:.3f}")
spark.stop()
"""


def make_engine_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(HERE, "tesseract_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, HERE))


def run_once(n_exec: int, zip_path: str, job_path: str) -> float:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR, OMP_NUM_THREADS="1")
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            f"local-cluster[{n_exec},{CORES_PER_EXEC},{EXEC_MEM_MB}]",
            "--py-files",
            zip_path,
            "--conf",
            f"spark.sql.shuffle.partitions={max(16, 4 * n_exec * CORES_PER_EXEC)}",
            "--conf",
            "spark.sql.adaptive.enabled=true",
            "--conf",
            "spark.driver.memory=6g",
            "--conf",
            "spark.sql.execution.arrow.maxRecordsPerBatch=256",
            "--conf",
            "spark.ui.enabled=false",
            job_path,
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=HERE,
        check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SUBMIT_RESULT"):
            return float(line.split("wall=")[1])
    raise RuntimeError(f"no SUBMIT_RESULT in output:\n{out.stdout[-2000:]}")


def main() -> None:
    zip_path = os.path.join(HERE, ".bench_corpus", "engine.zip")
    os.makedirs(os.path.dirname(zip_path), exist_ok=True)
    make_engine_zip(zip_path)
    job_path = os.path.join(HERE, ".bench_corpus", "submit_job.py")
    with open(job_path, "w") as f:
        f.write(JOB)
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    # SAME-SESSION interleaved best-of only: pairing minima accumulated
    # across historical sessions would mix time windows and reintroduce the
    # cross-window drift bias the interleaved protocol exists to avoid
    # (round-1 ADVICE).  Every wall below comes from this invocation.
    best = {1: float("inf"), 4: float("inf")}
    walls: dict[int, list[float]] = {1: [], 4: []}
    for _ in range(REPEATS):  # interleave levels (VM drift, BENCH.md)
        for n_exec in (1, 4):
            w = run_once(n_exec, zip_path, job_path)
            walls[n_exec].append(round(w, 3))
            best[n_exec] = min(best[n_exec], w)
    t1, t4 = best[1], best[4]
    eff = t1 / (4.0 * t4)
    report = {
        "job": "ocr_production_bucketed (shuffle-free payload)",
        "deployment": "spark-submit --py-files engine.zip, "
        f"local-cluster[E,{CORES_PER_EXEC},{EXEC_MEM_MB}] (separate executor JVMs)",
        "sf_dir": SF_DIR,
        "n_docs": int(n_docs),
        "protocol": "same-session interleaved best-of (no cross-session minima)",
        "walls_1exec_sec": walls[1],
        "walls_4exec_sec": walls[4],
        "flagship_T_1exec_sec": round(t1, 3),
        "flagship_T_4exec_sec": round(t4, 3),
        "docs_per_sec_1exec": round(n_docs / t1, 2),
        "docs_per_sec_4exec": round(n_docs / t4, 2),
        "scaling_efficiency_N_to_4N_executors": round(eff, 3),
        "gate": "E(N->4N executors) >= 0.8",
        "gate_passed": bool(eff >= 0.8),
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(HERE, "SUBMIT_SCALING.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
