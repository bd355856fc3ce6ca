"""Ranking / percent-of-total reports — abs-log's ``log_show`` surface.

[PK] ``log_show.py`` sorts aggregated docs, prints top-N (--limit) with
hits%% / bytes%% / time%% columns computed against period totals. Spark-first:
ranking window for per-group top-N (planned as a partial top-k per partition
before the shuffle), window-sum for percent-of-total.

Scale note: ``row_number`` over a partitioned window shuffles once on the
partition key; for the single-group case prefer ``orderBy().limit(n)`` which
Spark plans as TakeOrderedAndProject (no full sort, no single-reducer sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-N rows per group by descending ``order_col`` (ties broken by the
    remaining columns deterministically via the full ordering below)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(order_col), *[F.asc(c) for c in df.columns if c != order_col]
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n)
    )


def with_pct_of_total(
    df: DataFrame,
    measure_cols: list[str],
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``<m>_pct`` columns: measure / partition total * 100."""
    w = Window.partitionBy(*(partition_cols or []))
    out = df
    for m in measure_cols:
        out = out.withColumn(
            f"{m}_pct", F.round(F.col(m) * 100.0 / F.sum(m).over(w), 4)
        )
    return out
