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

#: Parsed-field struct produced by the Arrow path (pre-timestamp).
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
    ]
)

PARSED_FIELDS = [f.name for f in PARSED_SCHEMA.fields if f.name != "ts_str"] + ["ts"]


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


@pandas_udf(PARSED_SCHEMA)
def _detok_parse_udf(tokens: pd.Series) -> pd.DataFrame:
    n = len(tokens)
    cols: dict[str, list] = {f.name: [None] * n for f in PARSED_SCHEMA.fields}
    valid = [False] * n
    for i, toks in enumerate(tokens):
        if toks is None:
            continue
        line = "".join(map(chr, toks))
        m = _LINE_RE.match(line)
        if m is None:
            continue
        valid[i] = True
        (ip, ts_str, method, target, protocol, status, nbytes, rt) = m.groups()
        uri, _, args = target.partition("?")
        cols["ip"][i] = ip
        cols["ts_str"][i] = ts_str
        cols["method"][i] = method
        cols["uri"][i] = uri
        cols["args"][i] = args
        cols["protocol"][i] = protocol
        cols["status"][i] = int(status)
        cols["bytes"][i] = int(nbytes)
        cols["rt"][i] = float(rt)
    out = pd.DataFrame(
        {
            "ip": pd.array(cols["ip"], dtype="string"),
            "ts_str": pd.array(cols["ts_str"], dtype="string"),
            "method": pd.array(cols["method"], dtype="string"),
            "uri": pd.array(cols["uri"], dtype="string"),
            "args": pd.array(cols["args"], dtype="string"),
            "protocol": pd.array(cols["protocol"], dtype="string"),
            "status": pd.array(cols["status"], dtype="Int32"),
            "bytes": pd.array(cols["bytes"], dtype="Int64"),
            "rt": pd.array(cols["rt"], dtype="Float64"),
            "valid": pd.array(valid, dtype="boolean"),
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
