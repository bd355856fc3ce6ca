"""Old-data expiry (SURVEY.md S5) — abs-log's retention cleanup.

Reference behavior ([PK] config-driven retention): drop aggregate documents
older than N days so the summary store stays bounded. On Iceberg this is a
metadata-level ``DELETE FROM t WHERE minute < cutoff`` (partition drop when
the table is partitioned by a minute-derived column). The parquet stand-in
rewrites the (tiny) summary table filtered to the keep-range and swaps it in
atomically via the staging-promote move the catalog already uses.

Summary tables are bounded by |minutes| x |endpoints| — rewriting them is
cheap at any input scale; the 10^12-row routed tables are expired by
dropping whole ``part_bucket``/date partitions instead (directory removal,
never a rewrite).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from abs_log_spark.catalog import Catalog


def expire_summary(
    spark: SparkSession,
    cat: Catalog,
    table: str,
    cutoff,
    ts_col: str = "minute",
) -> dict:
    """Delete rows with ``ts_col < cutoff`` from a summary table.

    Returns {"kept": n, "dropped": n}. Equivalent Iceberg statement:
    ``DELETE FROM {table} WHERE {ts_col} < TIMESTAMP '{cutoff}'``.
    """
    if not cat.exists(table):
        return {"kept": 0, "dropped": 0}
    df = cat.read(spark, table)
    kept_df = df.where(F.col(ts_col) >= F.lit(cutoff))
    total = df.count()
    staging = f"_{table}_retention_staging"
    cat.write(kept_df.coalesce(1), staging)
    kept = cat.read(spark, staging).count()
    cat.drop(table)
    os.replace(cat.path(staging), cat.path(table))
    return {"kept": kept, "dropped": total - kept}


def expire_routed_buckets(cat: Catalog, table: str, buckets: list[str]) -> int:
    """Drop whole partition directories of a routed table (the scale path —
    a metadata/file operation, no data rewrite). ``buckets`` are partition
    values of the table's layout key, e.g. ``["0", "1"]`` for part_bucket.
    """
    import shutil

    root = cat.path(table)
    dropped = 0
    if not os.path.isdir(root):
        return 0
    for b in buckets:
        p = os.path.join(root, f"part_bucket={b}")
        if os.path.isdir(p):
            shutil.rmtree(p)
            dropped += 1
    return dropped
