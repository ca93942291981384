"""Driver-harness rehearsal: every registry query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row-count + schema + order-
insensitive value comparison) at sf0.001 so regressions surface in pytest
before the real gate runs at sf0.01.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tesseract_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(list(df.columns), na_position="first").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    fn, sql = REGISTRY[name]
    got = normalize(fn(spark, SF_DIR).toPandas())
    exp = normalize(duck.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        a, b = got[c], exp[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = pd.to_numeric(a, errors="coerce").astype(float)
            bf = pd.to_numeric(b, errors="coerce").astype(float)
            ok = np.allclose(af.fillna(-1e300), bf.fillna(-1e300), atol=1e-6)
        else:
            ok = a.astype(str).equals(b.astype(str))
        assert ok, f"{name}: column {c} differs\n{a.head()}\nvs\n{b.head()}"
