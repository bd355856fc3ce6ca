"""Report CLI over the pipeline warehouse — abs-log's ``log_show`` restated.

[PK] reference surface: ``log_show <site> [-f ymdHM -t ymdHM -l N
-g minute|ten_min|hour|day] [request | distribution | error | ip]`` querying
the MongoDB minute docs and printing fixed-width tables. Here the minute
docs are the pipeline's ``minute_agg_<sink>`` / ``errors_<sink>`` parquet
tables and every view is a DataFrame expression (operators/topk.py,
operators/aggregate.trend) — the aggregation runs in Spark, not the client.

Usage:
    python jobs/log_show.py WAREHOUSE SINK request [--limit 10] [--from 202401010000] [--to ...]
    python jobs/log_show.py WAREHOUSE SINK trend --group-by hour
    python jobs/log_show.py WAREHOUSE SINK error
"""

from __future__ import annotations

import argparse
import sys


def _parse_ymdhm(s: str):
    from datetime import datetime

    return datetime.strptime(s, "%Y%m%d%H%M")


def table_for_view(sink: str, view: str) -> str:
    """Which warehouse table a view reads: error -> errors_<sink>;
    detail/ip drill past the minute summaries into the routed rows
    (column-pruned parquet read: args_abs/source/measures only);
    everything else reads the minute summaries."""
    if view == "error":
        return f"errors_{sink}"
    if view in ("detail", "ip"):
        return f"routed_{sink}"
    return f"minute_agg_{sink}"


def build_view(df, view: str, *, sink: str = "", uri: str | None = None,
               limit: int = 10, group_by: str = "hour", pivot: bool = False):
    """Pure DataFrame -> DataFrame report views ([PK] log_show.py layouts);
    ``df`` is the table named by :func:`table_for_view`."""
    from pyspark.sql import functions as F

    from abs_log_spark.operators.aggregate import trend
    from abs_log_spark.operators.topk import top_n_per_group, with_pct_of_total

    if view == "request":
        agg = df.groupBy("uri_abs").agg(
            F.sum("pv").alias("hits"),
            F.sum("bytes_sum").alias("bytes"),
            F.sum("rt_sum").alias("time"),
        )
        agg = with_pct_of_total(agg, ["hits", "bytes", "time"])
        return top_n_per_group(agg, [], "hits", limit).select(
            "rank", "uri_abs", "hits", "hits_pct", "bytes", "bytes_pct",
            F.round("time", 3).alias("time"), "time_pct",
        )
    if view in ("trend", "distribution"):
        # reference name: 'distribution' — per-bucket totals, optionally for
        # a single abstracted endpoint ([PK] log_show request distribution <uri>)
        if uri:
            df = df.where(F.col("uri_abs") == uri)
        return (
            trend(df.withColumn("sink", F.lit(sink)), grain=group_by)
            .drop("sink")
            .orderBy("bucket")
            .limit(limit)
        )
    if view == "detail":
        # reference: log_show request detail <uri> — per-args breakdown of
        # one abstracted endpoint ([PK] log_show.py detail view)
        d = df.where(F.col("valid"))
        if uri:
            d = d.where(F.col("uri_abs") == uri)
        agg = d.groupBy("uri_abs", "args_abs").agg(
            F.count("*").alias("hits"),
            F.sum("bytes").alias("bytes"),
            F.round(F.sum("rt"), 3).alias("time"),
        )
        agg = with_pct_of_total(agg, ["hits"], ["uri_abs"])
        return top_n_per_group(agg, ["uri_abs"], "hits", limit)
    if view == "ip":
        # reference: log_show ip — top sources by PARSED hits ([PK] ip view);
        # invalid lines have no attributable request and never count here
        agg = df.where(F.col("valid")).groupBy("source").agg(
            F.count("*").alias("hits"),
            F.sum("bytes").alias("bytes"),
        )
        agg = with_pct_of_total(agg, ["hits"])
        return top_n_per_group(agg, [], "hits", limit)
    if view == "error":
        if pivot:
            # G7 optional layout: minute rows x status columns. pivot() needs
            # the column set; statuses are a tiny closed domain, one distinct
            # job discovers them (Spark then plans a single-shuffle pivot).
            return (
                df.groupBy("minute")
                .pivot("status")
                .agg(F.sum("hits"))
                .na.fill(0)
                .orderBy("minute")
                .limit(limit)
            )
        return (
            df.groupBy("status")
            .agg(F.sum("hits").alias("hits"))
            .orderBy(F.desc("hits"))
            .limit(limit)
        )
    raise ValueError(f"unknown view: {view}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="abs-log-spark report CLI")
    p.add_argument("warehouse")
    p.add_argument("sink")
    p.add_argument("view", choices=["request", "trend", "distribution", "error", "detail", "ip"])
    p.add_argument("--uri", default=None, help="uri_abs filter (detail / trend views)")
    p.add_argument("--from", dest="t_from", default=None, help="YYYYMMDDHHMM")
    p.add_argument("--to", dest="t_to", default=None, help="YYYYMMDDHHMM")
    p.add_argument("-l", "--limit", type=int, default=10)
    p.add_argument(
        "-g", "--group-by", default="hour", choices=["minute", "ten_min", "hour", "day"]
    )
    p.add_argument("--pivot", action="store_true",
                   help="error view: minute rows x status columns")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from abs_log_spark.catalog import Catalog
    from abs_log_spark.session import get_spark

    spark = get_spark(app_name="abs-log-spark:log_show", master=args.master)
    cat = Catalog(root=args.warehouse)

    table = table_for_view(args.sink, args.view)
    if not cat.exists(table):
        print(f"no table {table} under {args.warehouse}", file=sys.stderr)
        return 2
    df = cat.read(spark, table)
    ts_col = "ts" if args.view in ("detail", "ip") else "minute"
    # summary tables are partitioned by day: the coarse day predicate prunes
    # whole partition directories at the scan (PartitionFilters), the minute
    # predicate then row-filters inside the boundary days only
    has_day = "day" in df.columns
    if args.t_from:
        t0 = _parse_ymdhm(args.t_from)
        df = df.where(F.col(ts_col) >= F.lit(t0))
        if has_day:
            df = df.where(F.col("day") >= F.lit(t0.date()))
    if args.t_to:
        t1 = _parse_ymdhm(args.t_to)
        df = df.where(F.col(ts_col) < F.lit(t1))
        if has_day:
            df = df.where(F.col("day") <= F.lit(t1.date()))

    out = build_view(df, args.view, sink=args.sink, uri=args.uri,
                     limit=args.limit, group_by=args.group_by, pivot=args.pivot)
    print(out.toPandas().to_string(index=False))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
