"""Local replica of the driver's correctness gate: for every registered
query, run the Spark DataFrame AND the DuckDB oracle SQL on the same
parquet tables and compare row count, column names, and EXACT values
(order-insensitive). Exact equality here implies the driver's value-hash
agrees regardless of its hashing details.

Runs at sf0.001 for speed; the driver runs sf0.01 — query design avoids any
scale-dependent nondeterminism (rounding strategy in queries/core.py).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from abs_log_spark.queries import load_all
from abs_log_spark.sources.readers import TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.sql("SET TimeZone='UTC'")
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return (a == b) or math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return a == b


QUERIES = sorted(load_all().items())


@pytest.mark.parametrize("name", [n for n, (_f, s) in QUERIES if s is not None])
def test_query_matches_oracle(spark, name):
    fn, sql = load_all()[name]
    got = fn(spark, SF_DIR).toPandas()
    exp = _duck(sql)
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for col in g.columns:
        gv, ev = g[col].tolist(), e[col].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if not _cells_equal(a, b)
        ]
        assert not bad, f"{name}.{col}: {len(bad)} mismatches, first: {bad[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() > 0
    assert ent.queries().keys() >= set(ent.oracle_sql().keys())
