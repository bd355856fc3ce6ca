"""Round-6 optimization harness (bench.py is FROZEN for the driver's
measurement; this file holds the extra instrumentation the optimization
work needs — guide §1.4/§1.5).

Modes:
  python bench_extra.py --queries a,b,c [--sf DIR] [--reps N]
      per-query noop-sink walls (warmup rep discarded, min + all walls)
  python bench_extra.py --all [--sf DIR]
      the full headline set, bench.py methodology (warmup at sf0.001,
      one timed pass), without the pipeline leg
  python bench_extra.py --plans OUTDIR [--queries ...]
      write .explain("formatted") for each query to OUTDIR/<name>.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # the frozen headline list

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    from abs_log_spark.session import get_spark

    return get_spark("abs-log-spark-bench-extra", master=f"local[{CPUS}]")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_queries(spark, names, sf_dir, reps):
    from abs_log_spark import cache
    from abs_log_spark.queries import load_all

    reg = load_all()
    out = {}
    for name in names:
        fn, _sql = reg[name]
        walls = []
        for rep in range(reps + 1):  # rep 0 = warmup, discarded
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            _noop(fn(spark, sf_dir))
            walls.append(round(time.monotonic() - t0, 3))
            cache.release_all()
        out[name] = {"min": min(walls[1:]), "walls": walls}
        print(json.dumps({name: out[name]}), flush=True)
    return out


def run_all(spark, sf_dir):
    from abs_log_spark import cache
    from abs_log_spark.queries import load_all

    reg = load_all()
    for name in HEADLINE:  # untimed warmup, same as bench.py
        _noop(reg[name][0](spark, "/root/testdata/sf0.001"))
        cache.release_all()
    times = {}
    t0 = time.monotonic()
    for name in HEADLINE:
        fn, _sql = reg[name]
        t1 = time.monotonic()
        _noop(fn(spark, sf_dir))
        times[name] = round(time.monotonic() - t1, 3)
        cache.release_all()
    total = round(time.monotonic() - t0, 3)
    print(json.dumps({"headline_total": total, "queries": times}), flush=True)
    return times


def dump_plans(spark, names, sf_dir, outdir):
    from abs_log_spark.queries import load_all

    reg = load_all()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn, _sql = reg[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print("wrote", os.path.join(outdir, f"{name}.txt"), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", default=None)
    args = ap.parse_args()

    spark = _spark()
    names = args.queries.split(",") if args.queries else list(HEADLINE)
    if args.plans:
        dump_plans(spark, names, args.sf, args.plans)
    elif args.all:
        run_all(spark, args.sf)
    else:
        run_queries(spark, names, args.sf, args.reps)
    spark.stop()


if __name__ == "__main__":
    main()
