"""Two-parallelism scaling run (BASELINE.md protocol): same job, same input,
local[8] vs local[32]; efficiency E = T8 / (4 * T32).  Evidence for the
north-rule two-cluster-size criterion in this single-node sandbox.

Runs bench.py in subprocesses (one JVM each), pins the partition count to
>= 4x the larger core count for both runs, records per-run JSON plus the
per-partition runtime histogram of the flagship, and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PARTITIONS = "128"  # >= 4 x 32 cores, identical for both runs


def run(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PARTITIONS=PARTITIONS,
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    r8 = run(8)
    r32 = run(32)
    t8 = r8["queries"]["ocr_extract"]
    t32 = r32["queries"]["ocr_extract"]
    eff = t8 / (4.0 * t32)
    tot_eff = r8["value"] / (4.0 * r32["value"])
    report = {
        "sf_dir": SF_DIR,
        "partitions": int(PARTITIONS),
        "run_local8": r8,
        "run_local32": r32,
        "flagship_T8_sec": t8,
        "flagship_T32_sec": t32,
        "flagship_docs_per_sec_8": r8["docs_per_sec"],
        "flagship_docs_per_sec_32": r32["docs_per_sec"],
        "scaling_efficiency_flagship": round(eff, 3),
        "scaling_efficiency_total": round(tot_eff, 3),
        "gate": "E >= 0.8",
        "gate_passed": eff >= 0.8,
    }
    print(json.dumps(report, indent=2))
    with open("SCALING.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
