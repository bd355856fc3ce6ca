"""Abstraction rules (A1/A2) — table-driven + dual-path parity (SURVEY 5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from abs_log_spark.functions.abstract import (
    args_abs_col,
    args_abs_udf,
    uri_abs_col,
    uri_abs_udf,
)

URI_CASES = [
    ("/api/user/123/profile", "/api/user/*/profile"),
    ("/item/900150983cd24fb0d6963f7d28e17f72", "/item/*"),
    ("/order/55/detail/900150983c-d24f-b0d6-963f-7d28e17f72", "/order/*/detail/*"),
    ("/static/app.js", "/static/app.js"),
    ("/search", "/search"),
    ("/", "/"),
    ("/a/b/c", "/a/b/c"),
    ("/v2/12ab34cd-5678-90ef-aaaa-bbbbccccdddd/x", "/v2/*/x"),
    ("/short/abc123/x", "/short/abc123/x"),  # mixed short segment stays
    ("/deadbeefcafe", "/*"),  # long pure-hex collapses
]

ARGS_CASES = [
    ("q=x&page=2", "q=*&page=*"),
    ("id=777", "id=*"),
    ("", ""),
    ("a=1&b=&c", "a=*&b=*&c=*"),
    ("key=a=b", "key=*"),
]


def test_uri_abs_builtin(spark):
    df = spark.createDataFrame([(u,) for u, _ in URI_CASES], "uri string")
    got = [r.a for r in df.select(uri_abs_col(F.col("uri")).alias("a")).collect()]
    assert got == [e for _, e in URI_CASES]


def test_args_abs_builtin(spark):
    df = spark.createDataFrame([(a,) for a, _ in ARGS_CASES], "args string")
    got = [r.a for r in df.select(args_abs_col(F.col("args")).alias("a")).collect()]
    assert got == [e for _, e in ARGS_CASES]


def test_dual_path_parity(spark):
    """pandas-UDF path must agree with the builtin-expression path."""
    uris = [u for u, _ in URI_CASES] + [None]
    args = [a for a, _ in ARGS_CASES] + [None]
    rows = [(u, a) for u in uris for a in args]
    df = spark.createDataFrame(rows, "uri string, args string")
    mismatches = (
        df.select(
            uri_abs_col(F.col("uri")).alias("u1"),
            uri_abs_udf(F.col("uri")).alias("u2"),
            args_abs_col(F.col("args")).alias("a1"),
            args_abs_udf(F.col("args")).alias("a2"),
        )
        .where(
            ~(F.col("u1").eqNullSafe(F.col("u2")) & F.col("a1").eqNullSafe(F.col("a2")))
        )
        .count()
    )
    assert mismatches == 0
