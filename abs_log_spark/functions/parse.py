"""Vectorized log-line parsing: tokens -> typed access-log fields.

abs-log compiles the user's nginx ``log_format`` into a regex and extracts
named groups per line ([PK] expected upstream ``log_analyse.py``; [B]
north_star: "vectorized regex/grok parsing of log-structured records via
pandas/Arrow UDFs"). This module is the Spark-first re-expression:

- ``parse_expr(df)``: builtin path — detokenize via ``char``/``array_join``
  then ``regexp_extract`` per field. Fully JVM-side / WholeStageCodegen;
  used for DuckDB-oracle parity and as the fallback when Python workers are
  undesirable.
- ``parse_arrow(df)``: the mandated vectorized path — ONE fused pandas UDF
  per Arrow batch doing detokenize + compiled-regex extract and returning a
  struct (one Python crossing per batch, not one per field; SURVEY.md
  section 4.3 "One Arrow hop").

Both paths:
- never drop rows: non-matching lines get ``valid=false`` and null fields —
  abs-log counts them as ``invalid_hits`` ([PK] invalid-line counter).
- leave the input ``tokens`` column untouched ([B] token-equality invariant).
- convert ``time_local`` to a session-TZ timestamp JVM-side (shared code, so
  the two paths cannot diverge on timestamp semantics).

Log line shape (FIXTURES.md A1a; canonical nginx ``combined``-like subset):

    <ip> - [<time_local>] "<method> <uri>[?<args>] <protocol>" <status> <bytes> <rt>
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from abs_log_spark.functions.tokens import detokenize_col

#: The declared log format, compiled to one regex — schema-on-read exactly as
#: abs-log does it, but applied to whole Arrow batches.
LINE_PATTERN = (
    r'^(\S+) - \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d{3}) (\d+) ([0-9.]+)$'
)
_LINE_RE = re.compile(LINE_PATTERN)

#: nginx $time_local -> Spark datetime pattern (session TZ = UTC).
TIME_FORMAT = "dd/MMM/yyyy:HH:mm:ss Z"

#: Parsed-field struct produced by the Arrow path (pre-timestamp). The Arrow
#: path also emits the abstraction columns — one more vectorized str.replace
#: over a batch already in pandas costs far less than a second JVM projection
#: over the same 10^12 rows (measured ~10s/2M saved vs builtin transform()).
PARSED_SCHEMA = StructType(
    [
        StructField("ip", StringType()),
        StructField("ts_str", StringType()),
        StructField("method", StringType()),
        StructField("uri", StringType()),
        StructField("args", StringType()),
        StructField("protocol", StringType()),
        StructField("status", IntegerType()),
        StructField("bytes", LongType()),
        StructField("rt", DoubleType()),
        StructField("valid", BooleanType()),
        StructField("uri_abs", StringType()),
        StructField("args_abs", StringType()),
    ]
)

#: Fields common to both parse paths (expr path adds abstraction separately).
PARSED_FIELDS = [
    f.name
    for f in PARSED_SCHEMA.fields
    if f.name not in ("ts_str", "uri_abs", "args_abs")
] + ["ts"]


def _finish(df: DataFrame) -> DataFrame:
    """Shared JVM-side tail: ts_str -> timestamp, drop the intermediate."""
    return df.withColumn("ts", F.to_timestamp("ts_str", TIME_FORMAT)).drop("ts_str")


# ---------------------------------------------------------------------------
# Builtin-expression path
# ---------------------------------------------------------------------------


def _extract(line: Column, group: int) -> Column:
    return F.regexp_extract(line, LINE_PATTERN, group)


def parse_expr(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Builtin path: detokenize + regexp_extract. ASCII log lines only."""
    line = detokenize_col(F.col(tokens_col))
    valid = line.rlike(LINE_PATTERN)
    out = df.withColumn("_line", line).withColumn("valid", valid)
    nul = F.lit(None)
    out = (
        out.withColumn("ip", F.when(valid, _extract(F.col("_line"), 1)).otherwise(nul))
        .withColumn("ts_str", F.when(valid, _extract(F.col("_line"), 2)).otherwise(nul))
        .withColumn("method", F.when(valid, _extract(F.col("_line"), 3)).otherwise(nul))
        .withColumn(
            "uri",
            # try_element_at: ANSI-safe when the target has no '?' part
            F.when(valid, F.try_element_at(F.split(_extract(F.col("_line"), 4), r"\?", 2), F.lit(1))).otherwise(nul),
        )
        .withColumn(
            "args",
            F.when(
                valid,
                F.coalesce(
                    F.try_element_at(F.split(_extract(F.col("_line"), 4), r"\?", 2), F.lit(2)),
                    F.lit(""),
                ),
            ).otherwise(nul),
        )
        .withColumn("protocol", F.when(valid, _extract(F.col("_line"), 5)).otherwise(nul))
        .withColumn(
            "status", F.when(valid, _extract(F.col("_line"), 6).cast("int")).otherwise(nul)
        )
        .withColumn(
            "bytes", F.when(valid, _extract(F.col("_line"), 7).cast("long")).otherwise(nul)
        )
        .withColumn(
            "rt", F.when(valid, _extract(F.col("_line"), 8).cast("double")).otherwise(nul)
        )
        .drop("_line")
    )
    return _finish(out)


# ---------------------------------------------------------------------------
# Fused Arrow path: ONE pandas UDF = detokenize + parse (struct return)
# ---------------------------------------------------------------------------


def _detok_batch(tokens: pd.Series) -> pd.Series:
    """list<int32> -> str per row. Code points arrive as numpy int arrays;
    ASCII-range batches take the fast bytes path, anything else falls back
    to chr-join (full Unicode)."""
    import numpy as np

    def one(toks):
        if toks is None:
            return None
        arr = np.asarray(toks)
        if arr.size and arr.max(initial=0) < 128 and arr.min(initial=0) >= 0:
            return arr.astype(np.uint8).tobytes().decode("ascii")
        return "".join(map(chr, toks))

    return tokens.map(one)


@pandas_udf(PARSED_SCHEMA)
def _detok_parse_udf(tokens: pd.Series) -> pd.DataFrame:
    """Fused detokenize + parse, vectorized: ONE C-level regex pass per Arrow
    batch (pandas str.extract), not a Python loop per row."""
    lines = _detok_batch(tokens)
    g = lines.str.extract(_LINE_RE)  # 8 group columns, NaN on non-match
    valid = g[0].notna() & lines.notna()
    target = g[3].astype("string")
    split_t = target.str.split("?", n=1, regex=False)
    uri = split_t.str[0].astype("string")
    args = split_t.str[1].astype("string")
    args = args.where(args.notna() | ~valid, "")  # valid + no '?' -> ''
    from abs_log_spark.functions.abstract import (
        _abstract_args_series,
        _abstract_uri_series,
    )

    uri_abs = _abstract_uri_series(uri)
    args_abs = _abstract_args_series(args)
    out = pd.DataFrame(
        {
            "ip": g[0].astype("string"),
            "ts_str": g[1].astype("string"),
            "method": g[2].astype("string"),
            "uri": uri,
            "args": args,
            "protocol": g[4].astype("string"),
            "status": g[5].astype("float").astype("Int32"),
            "bytes": g[6].astype("float").astype("Int64"),
            "rt": g[7].astype("float").astype("Float64"),
            "valid": pd.array(valid.fillna(False), dtype="boolean"),
            "uri_abs": uri_abs.astype("string"),
            "args_abs": args_abs.astype("string"),
        }
    )
    return out


def parse_arrow(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Vectorized path: one Arrow crossing per batch, struct out, then the
    shared JVM timestamp tail. The ``tokens`` column passes through untouched.
    """
    parsed = df.withColumn("_p", _detok_parse_udf(F.col(tokens_col)))
    flat = parsed.select("*", "_p.*").drop("_p")
    return _finish(flat)
