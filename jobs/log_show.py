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
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from abs_log_spark.catalog import Catalog
    from abs_log_spark.operators.aggregate import trend
    from abs_log_spark.operators.topk import top_n_per_group, with_pct_of_total
    from abs_log_spark.session import get_spark

    spark = get_spark(app_name="abs-log-spark:log_show", master=args.master)
    cat = Catalog(root=args.warehouse)

    if args.view == "error":
        table = f"errors_{args.sink}"
    elif args.view in ("detail", "ip"):
        # these drill past the minute summaries into the routed rows
        # (column-pruned parquet read: args_abs/source/measures only)
        table = f"routed_{args.sink}"
    else:
        table = f"minute_agg_{args.sink}"
    if not cat.exists(table):
        print(f"no table {table} under {args.warehouse}", file=sys.stderr)
        return 2
    df = cat.read(spark, table)
    ts_col = "ts" if args.view in ("detail", "ip") else "minute"
    if args.t_from:
        df = df.where(F.col(ts_col) >= F.lit(_parse_ymdhm(args.t_from)))
    if args.t_to:
        df = df.where(F.col(ts_col) < F.lit(_parse_ymdhm(args.t_to)))

    if args.view == "request":
        agg = df.groupBy("uri_abs").agg(
            F.sum("pv").alias("hits"),
            F.sum("bytes_sum").alias("bytes"),
            F.sum("rt_sum").alias("time"),
        )
        agg = with_pct_of_total(agg, ["hits", "bytes", "time"])
        out = top_n_per_group(agg, [], "hits", args.limit).select(
            "rank", "uri_abs", "hits", "hits_pct", "bytes", "bytes_pct",
            F.round("time", 3).alias("time"), "time_pct",
        )
    elif args.view in ("trend", "distribution"):
        # reference name: 'distribution' — per-bucket totals, optionally for
        # a single abstracted endpoint ([PK] log_show request distribution <uri>)
        if args.uri:
            df = df.where(F.col("uri_abs") == args.uri)
        out = (
            trend(df.withColumn("sink", F.lit(args.sink)), grain=args.group_by)
            .drop("sink")
            .orderBy("bucket")
            .limit(args.limit)
        )
    elif args.view == "detail":
        # reference: log_show request detail <uri> — per-args breakdown of
        # one abstracted endpoint ([PK] log_show.py detail view)
        d = df.where(F.col("valid"))
        if args.uri:
            d = d.where(F.col("uri_abs") == args.uri)
        agg = d.groupBy("uri_abs", "args_abs").agg(
            F.count("*").alias("hits"),
            F.sum("bytes").alias("bytes"),
            F.round(F.sum("rt"), 3).alias("time"),
        )
        agg = with_pct_of_total(agg, ["hits"], ["uri_abs"])
        out = top_n_per_group(agg, ["uri_abs"], "hits", args.limit)
    elif args.view == "ip":
        # reference: log_show ip — top sources by hits ([PK] ip view)
        agg = df.groupBy("source").agg(
            F.count("*").alias("hits"),
            F.sum("bytes").alias("bytes"),
        )
        agg = with_pct_of_total(agg, ["hits"])
        out = top_n_per_group(agg, [], "hits", args.limit)
    else:  # error
        out = (
            df.groupBy("status")
            .agg(F.sum("hits").alias("hits"))
            .orderBy(F.desc("hits"))
            .limit(args.limit)
        )

    print(out.toPandas().to_string(index=False))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
