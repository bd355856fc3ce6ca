"""End-to-end pipeline: parse -> abstract -> enrich -> route -> aggregate.

The Spark-first restatement of abs-log's collector lifecycle ([PK]
``log_analyse.py`` main loop; SURVEY.md section 3.4):

    read sequences (prune completed part_buckets via checkpoint anti-join)
      -> STAGE parse   : ONE fused pandas UDF (detok + regex) per Arrow batch
      -> STAGE abstract: uri_abs/args_abs builtin exprs (JVM, codegen)
      -> STAGE enrich  : broadcast join on the source dimension
      -> STAGE route   : persist once, fan out to per-sink routed tables
      -> STAGE agg     : per-sink minute summaries + error view
      -> checkpoint + metrics rows

Every stage is a pure DataFrame -> DataFrame function so the driver harness
can register them individually and a Structured-Streaming foreachBatch can
reuse them unchanged (SURVEY.md section 2.10).

Scale design decisions (10^12 rows / 1000 executors):
- one persist of the routed DF serves N sink writes + nothing else; each
  sink write is a partition-pruned filter on the cached data.
- routed tables are partitioned by ``part_bucket`` and written with dynamic
  partition overwrite -> idempotent per-bucket re-runs (resume).
- minute aggregates are recomputed from the routed tables (derived data),
  so resume never has to merge partial aggregates.
- the only wide shuffle in the job is the groupBy for the minute summary;
  Spark plans it partial+final with the approx_percentile sketch merging
  map-side. AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from abs_log_spark.catalog import Catalog
from abs_log_spark.functions.abstract import args_abs_col, uri_abs_col
from abs_log_spark.functions.parse import parse_arrow, parse_expr
from abs_log_spark.operators.aggregate import error_view, minute_agg
from abs_log_spark.operators.enrich import enrich
from abs_log_spark.plans import checkpoint as ckpt
from abs_log_spark.plans.metrics import StageMetrics
from abs_log_spark.sources.synth import DEFAULT_SINK


@dataclass
class PipelineConfig:
    use_arrow: bool = True          # pandas-UDF parse (prod) vs builtin (oracle)
    exact_quantiles: bool = False   # exact percentile (oracle) vs sketch (scale)
    resume: bool = True
    routed_partition_cols: tuple[str, ...] = ("part_bucket",)
    sinks: tuple[str, ...] = field(default=())  # () -> derive from dim + default


def abstract_stage(df: DataFrame) -> DataFrame:
    return df.withColumn("uri_abs", uri_abs_col(F.col("uri"))).withColumn(
        "args_abs", args_abs_col(F.col("args"))
    )


def transform(seq_df: DataFrame, dim: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """parse -> abstract -> enrich, no I/O. The routed relation (FIXTURES A3):
    input columns UNTOUCHED (token-equality invariant) + parsed fields +
    abstractions + sink/site."""
    cfg = cfg or PipelineConfig()
    parsed = parse_arrow(seq_df) if cfg.use_arrow else parse_expr(seq_df)
    return enrich(abstract_stage(parsed), dim)


def run_pipeline(
    spark: SparkSession,
    cat: Catalog,
    seq_df: DataFrame,
    dim: DataFrame,
    run_id: str,
    cfg: PipelineConfig | None = None,
) -> dict:
    """One batch run. Returns summary metrics. Idempotent under re-run."""
    cfg = cfg or PipelineConfig()
    metrics = StageMetrics()

    done = ckpt.completed_partitions(spark, cat, "routed") if cfg.resume else set()
    pending = ckpt.filter_pending(seq_df, done)
    pending = metrics.observe_input(pending)

    routed = transform(pending, dim, cfg)
    routed = metrics.observe_routed(routed)
    routed = routed.persist(StorageLevel.MEMORY_AND_DISK)

    sinks = list(cfg.sinks) or [
        r.sink for r in dim.select("sink").distinct().collect()
    ] + [DEFAULT_SINK]

    # Which input buckets are in this increment? (tiny: <= bucket count)
    buckets = [r.part_bucket for r in pending.select("part_bucket").distinct().collect()]

    processed_any = False
    for sink in sinks:
        part = routed.where(F.col("sink") == sink)
        cat.write(part, f"routed_{sink}", partition_by=cfg.routed_partition_cols)
        processed_any = True

    if buckets:
        ckpt.mark_done(spark, cat, run_id, "routed", [str(b) for b in buckets])

    # Derived aggregates: recomputed from the full routed tables (all buckets,
    # including previously completed ones) -> resume-safe without agg merges.
    for sink in sinks:
        tbl = f"routed_{sink}"
        if not cat.exists(tbl):
            continue
        full = cat.read(spark, tbl).withColumn("sink", F.lit(sink))
        cat.write(
            minute_agg(full, exact_quantiles=cfg.exact_quantiles),
            f"minute_agg_{sink}",
        )
        cat.write(error_view(full), f"errors_{sink}")

    vals = metrics.flush(spark, cat, run_id, [str(b) for b in buckets])
    routed.unpersist()
    vals["buckets_processed"] = len(buckets)
    vals["buckets_skipped"] = len(done)
    vals["sinks"] = sinks
    vals["any_write"] = processed_any
    return vals
