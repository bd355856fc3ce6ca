"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator (SURVEY.md section 2)
with DuckDB oracle twins. Implementations live in ``abs_log_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from abs_log_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tokens -> parse -> abstract -> enrich -> minute-agg
    pipeline over sequences derived from /root/testdata/sf0.001 documents."""
    from abs_log_spark.queries.core import pipeline_e2e_minute_agg

    return pipeline_e2e_minute_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in load_all().items() if sql is not None
    }
