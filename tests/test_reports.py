"""Report-surface extras: approx-distinct scale path, retention expiry."""

from __future__ import annotations

from pyspark.sql import functions as F

from abs_log_spark.operators.retention import expire_routed_buckets, expire_summary
from abs_log_spark.sources.readers import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_count_distinct_close_to_exact(spark):
    """G9 scale path: HLL sketch within 5% of exact distinct per group."""
    ev = read_table(spark, SF_DIR, "events")
    df = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    )
    for r in df.collect():
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.05 * r["exact"]), r


def test_expire_summary(spark, tmp_catalog):
    """S5: rows older than the cutoff are deleted, newer rows survive."""
    df = spark.range(100).select(
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(mins=F.col("id").cast("int"))).alias("minute"),
        F.col("id").alias("pv"),
    )
    tmp_catalog.write(df, "minute_agg_s")
    res = expire_summary(spark, tmp_catalog, "minute_agg_s", "2024-01-01 00:40:00")
    assert res == {"kept": 60, "dropped": 40}
    remaining = tmp_catalog.read(spark, "minute_agg_s")
    assert remaining.count() == 60
    assert remaining.agg(F.min("pv")).first()[0] == 40


def test_expire_routed_buckets(spark, tmp_catalog):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("part_bucket")
    )
    tmp_catalog.write(df, "routed_x", partition_by=("part_bucket",))
    assert expire_routed_buckets(tmp_catalog, "routed_x", ["0", "2"]) == 2
    left = tmp_catalog.read(spark, "routed_x")
    assert set(r[0] for r in left.select("part_bucket").distinct().collect()) == {1, 3}
