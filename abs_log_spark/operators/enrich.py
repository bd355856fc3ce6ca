"""Lookup enrichment + sink routing via broadcast join ([B] north_star J1).

abs-log carries site context in config, one Mongo collection per site ([PK]);
the graft makes it a relational broadcast join on the ``source`` dimension:

- LEFT join: unknown sources must never be dropped — they route to
  ``sink_default`` (observable, not silent).
- ``F.broadcast`` forces a broadcast-hash join regardless of statistics; the
  dimension is tiny (one row per source) while the fact side is 10^12 rows,
  so this is the only join strategy that avoids shuffling the fact table.
  At 100 TB the alternative (sort-merge) would shuffle the full input on a
  Zipf-skewed key — broadcast makes source-skew a non-event for the join
  (skew then only matters at the aggregate, handled by AQE + salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from abs_log_spark.sources.synth import DEFAULT_SINK


def enrich(df: DataFrame, dim: DataFrame, key: str = "source") -> DataFrame:
    """Broadcast-left-join the source dimension; default-route unknowns."""
    out = df.join(F.broadcast(dim), key, "left")
    return out.withColumn("sink", F.coalesce(F.col("sink"), F.lit(DEFAULT_SINK)))
