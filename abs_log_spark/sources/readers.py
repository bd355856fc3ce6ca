"""Readers for the driver-provided testdata plus the documents->sequences bridge.

``/root/testdata/sf*/`` holds TPC-H-ish tables + ``events``, ``documents``,
``embeddings`` (TESTDATA.md). ``sequences_from_documents`` derives the
north-rule input table deterministically FROM the driver's ``documents``
table (FIXTURES.md section B "bridging trick"): the rendered log line is a
pure function of ``doc_id``, so a DuckDB oracle can reproduce any aggregate
over the parsed fields without ever seeing an array column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from abs_log_spark.functions.tokens import tokenize_col
from abs_log_spark.sources.synth import log_line_expr

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def sequences_from_documents(
    spark: SparkSession, sf_dir: str, materialized: bool = True
) -> DataFrame:
    """North-rule ``sequences`` derived from the driver ``documents`` table.

    doc_id/source come from documents; tokens spell the synthetic log line
    rendered from the numeric doc_id (same renderer as the pure-synth
    fixture, so parsing/abstraction behave identically).

    ``materialized`` (default): the derivation is written once per sf to a
    /tmp parquet cache and read back — the engine's real input is a TABLE,
    not an expression tree; without this, every query over sequences re-pays
    the fixture rendering (line format + tokenize) instead of a scan.
    """
    if materialized:
        # cache key = abs path + source-parquet mtime: distinct sf dirs with
        # the same basename cannot alias, and a regenerated documents fixture
        # invalidates the cache instead of serving stale sequences forever
        import hashlib

        src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
        try:
            mtime = str(int(os.path.getmtime(src)))
        except OSError:
            mtime = "0"
        label = os.path.basename(sf_dir.rstrip("/"))
        key = hashlib.md5(f"{src}|{mtime}".encode()).hexdigest()[:10]
        cache = f"/tmp/abslog_sequences_{label}_{key}"
        if not os.path.exists(os.path.join(cache, "_SUCCESS")):
            sequences_from_documents(spark, sf_dir, materialized=False).write.mode(
                "overwrite"
            ).parquet(cache)
        return spark.read.parquet(cache)
    docs = read_table(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    line = log_line_expr(i)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        tokenize_col(line).alias("tokens"),
        F.col("source"),
    ).select(
        "doc_id",
        "tokens",
        F.size("tokens").cast("int").alias("n_tok"),
        "source",
        F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int").alias("part_bucket"),
    )


def sources_dim_for_documents(spark: SparkSession, n_sources: int = 20) -> DataFrame:
    """Dimension covering the driver documents' src0..src19 domain.

    Same k % 3 sink rule as the synthetic dim, expressible in ANSI SQL for
    the DuckDB oracle: sink = CASE (CAST(substr(source,4) AS INT) % 3) ...
    """
    from abs_log_spark.sources.synth import gen_sources_dim

    return gen_sources_dim(spark, n_sources=n_sources)
