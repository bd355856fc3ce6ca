"""Driver-facing query registry.

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None).
The oracle SQL is ANSI SQL DuckDB runs on the same parquet tables (views
``region nation customer supplier part orders lineitem events documents
embeddings`` pre-registered). Column names/aliases MUST match the Spark
output exactly; floats are rounded identically on both sides so the driver's
order-insensitive value hash agrees.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def load_all() -> dict[str, tuple[SparkQuery, str | None]]:
    """Import every query module so REGISTRY is fully populated."""
    from abs_log_spark.queries import (  # noqa: F401
        ann,
        core,
        curation,
        dedup,
        streaming,
        textops,
    )

    return REGISTRY
