"""Streaming parse -> abstract -> enrich -> windowed minute aggregate.

Two execution shapes, both reusing the batch stages verbatim:

1. **Native windowed aggregation** (:func:`streaming_minute_agg`): event-time
   tumbling 1-minute windows with a watermark for late data. State-store
   friendly measures only (counts/sums/min/max — all mergeable); quantile
   sketches stay on the batch/foreachBatch path, mirroring the reference's
   own limitation that coarse regroupings carry totals only (see
   ``operators.aggregate.trend``).
2. **foreachBatch micro-batching** (:func:`run_stream_foreach_batch`): each
   micro-batch runs the full batch semantics (including exact/approx
   quantiles *within* the batch) and appends partial aggregates keyed by
   batch_id; :func:`merge_agg_partials` folds partials into final per-minute
   totals. This is the shape that maps 1:1 onto the reference's cron
   increments ([PK] each cron run aggregates its new lines, MongoDB upserts
   merge them).

Scale notes: the streaming state for (1) is bounded by
|windows within watermark| x |sink, site, uri_abs| — small, because
abstraction collapses the URI space. The stream-static broadcast join keeps
enrichment shuffle-free; only the windowed groupBy shuffles.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from abs_log_spark.catalog import Catalog
from abs_log_spark.operators.aggregate import minute_agg
from abs_log_spark.plans.pipeline import PipelineConfig, transform

#: north-rule input schema ([B] input_hint) + the layout bucket column.
SEQUENCES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
        StructField("part_bucket", IntegerType(), True),
    ]
)


def read_sequence_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a sequences parquet directory.

    On a cluster this is ``spark.readStream.table(...)`` against the Iceberg
    sequences table (incremental snapshot reads); the file source is the
    sandbox stand-in with identical downstream semantics.
    """
    r = spark.readStream.schema(SEQUENCES_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def streaming_minute_agg(
    seq_stream: DataFrame,
    dim: DataFrame,
    watermark: str = "10 minutes",
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Event-time 1-minute tumbling-window aggregate with late-data handling.

    Reuses the batch ``transform`` (Arrow parse + abstraction + broadcast
    enrich) — stateless stages apply to streaming DataFrames unchanged. Only
    valid rows enter the windowed state (invalid rows have no event time),
    but they are NEVER silently dropped: a named ``observe`` on the
    pre-filter stream counts them per micro-batch (surfaced in every
    StreamingQueryProgress under observedMetrics['routed_rows'] — the
    streaming twin of the batch invalid_hits accounting, zero extra pass).
    """
    routed = transform(seq_stream, dim, cfg).observe(
        "routed_rows",
        F.count(F.lit(1)).alias("rows_routed"),
        F.sum(F.when(~F.col("valid"), 1).otherwise(0)).alias("rows_invalid"),
    )
    return (
        routed.where(F.col("valid"))
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 minute").alias("win"),
            F.col("sink"),
            F.col("site"),
            F.col("uri_abs"),
        )
        .agg(
            F.count("*").alias("pv"),
            F.sum("bytes").cast("long").alias("bytes_sum"),
            F.sum("rt").alias("rt_sum"),
            F.min("rt").alias("rt_min"),
            F.max("rt").alias("rt_max"),
            F.sum(F.when(F.col("status") >= 400, 1).otherwise(0)).alias("err_hits"),
        )
        .select(F.col("win.start").alias("minute"), "sink", "site", "uri_abs",
                "pv", "bytes_sum", "rt_sum", "rt_min", "rt_max", "err_hits")
    )


#: measures of minute_agg that merge exactly across micro-batch partials.
_MERGEABLE = ("pv", "bytes_sum", "rt_sum", "err_hits", "invalid_hits")


def merge_agg_partials(partials: DataFrame) -> DataFrame:
    """Fold per-batch minute_agg partials into final per-minute totals.

    Counts/sums add; min/max combine; avg is re-derived from sums. Quantile
    columns are per-batch only and intentionally dropped here — exact
    cross-batch quantiles require the raw values (the batch pipeline's job);
    the reference has the same split (per-run quartiles, summed reports).

    Exactly-once under foreachBatch replay: a crash between the partials
    append and the streaming checkpoint commit re-runs the SAME batch_id over
    the same input files; the deterministic transform re-appends identical
    partial rows. Deduping on (batch_id, group keys) before summing restores
    exactly-once — without it every replayed batch double-counts pv/bytes/rt.
    """
    keys = ("sink", "site", "minute", "uri_abs")
    if "batch_id" in partials.columns:
        partials = partials.dropDuplicates(["batch_id", *keys])
    return partials.groupBy(*keys).agg(
        *[
            F.sum(m).cast("double" if m == "rt_sum" else "long").alias(m)
            for m in _MERGEABLE
        ],
        # rt is present on exactly the valid (pv-counted) rows, so the global
        # average re-derives from the summed partials.
        (F.sum("rt_sum") / F.sum("pv")).alias("rt_avg"),
        F.min("rt_min").alias("rt_min"),
        F.max("rt_max").alias("rt_max"),
    )


def run_stream_foreach_batch(
    spark: SparkSession,
    cat: Catalog,
    input_path: str,
    dim: DataFrame,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    on_batch: Callable[[int, int], None] | None = None,
):
    """Micro-batch the stream through the full batch semantics.

    Each batch: transform -> minute_agg -> append partials tagged with
    batch_id to ``minute_agg_partials`` (append-only => replayable; the
    streaming checkpoint gives exactly-once batch ids, so a restarted query
    re-runs an uncommitted batch and its re-append replaces nothing —
    dedup on (batch_id, keys) at merge time is the Iceberg-snapshot
    stand-in). Returns the started StreamingQuery.
    """
    cfg = cfg or PipelineConfig()
    stream = read_sequence_stream(spark, input_path, max_files_per_trigger)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        routed = transform(batch_df, dim, cfg)
        agg = minute_agg(routed, exact_quantiles=cfg.exact_quantiles)
        cat.append(agg.withColumn("batch_id", F.lit(batch_id)), "minute_agg_partials")
        if on_batch is not None:
            on_batch(batch_id, batch_df.count())

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
