"""Structured Streaming variant (SURVEY.md 2.10): the batch stages composed
into readStream must produce exactly the batch answers."""

from __future__ import annotations

import math

import pytest

from abs_log_spark.operators.aggregate import minute_agg
from abs_log_spark.plans.pipeline import transform
from abs_log_spark.sources.synth import gen_sequences, gen_sources_dim
from abs_log_spark.streaming import (
    merge_agg_partials,
    read_sequence_stream,
    run_stream_foreach_batch,
    streaming_minute_agg,
)

N = 3000


@pytest.fixture()
def seq_input(spark, tmp_path):
    seq = gen_sequences(spark, N, invalid_every=100)
    input_dir = str(tmp_path / "input")
    seq.repartition(3).write.parquet(input_dir)
    return seq, input_dir


def _rows(df, cols):
    return {
        tuple(str(r[c]) for c in cols[0]): [r[c] for c in cols[1]]
        for r in df.collect()
    }


KEYS = ["sink", "site", "minute", "uri_abs"]


def test_native_windowed_agg_equals_batch(spark, tmp_path, seq_input):
    """Event-time tumbling-window streaming agg (complete mode) == batch
    minute_agg on the valid rows, window-for-minute."""
    seq, input_dir = seq_input
    dim = gen_sources_dim(spark)
    agg = streaming_minute_agg(read_sequence_stream(spark, input_dir), dim)
    q = (
        agg.writeStream.format("memory")
        .queryName("mstream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_native"))
        .start()
    )
    q.awaitTermination()
    got = _rows(spark.table("mstream"), (KEYS, ["pv", "bytes_sum", "err_hits"]))

    batch = minute_agg(transform(seq, dim)).where("pv > 0")
    want = _rows(batch, (KEYS, ["pv", "bytes_sum", "err_hits"]))
    assert got == want


def test_foreachbatch_partials_merge_to_batch_answer(spark, tmp_path, tmp_catalog, seq_input):
    """Micro-batched foreachBatch partials, merged, == single-pass batch agg
    on every mergeable measure (incl. the invalid-row null-key group)."""
    seq, input_dir = seq_input
    dim = gen_sources_dim(spark)
    q = run_stream_foreach_batch(
        spark,
        tmp_catalog,
        input_dir,
        dim,
        checkpoint_dir=str(tmp_path / "ckpt_fb"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    partials = tmp_catalog.read(spark, "minute_agg_partials")
    n_batches = partials.select("batch_id").distinct().count()
    assert n_batches >= 2, "multi-file input must produce multiple micro-batches"

    merged = merge_agg_partials(partials)
    exact_cols = ["pv", "bytes_sum", "err_hits", "invalid_hits"]
    float_cols = ["rt_sum", "rt_avg", "rt_min", "rt_max"]
    got = _rows(merged, (KEYS, exact_cols + float_cols))
    want = _rows(minute_agg(transform(seq, dim)), (KEYS, exact_cols + float_cols))

    assert set(got) == set(want)
    for k, g in got.items():
        w = want[k]
        assert g[: len(exact_cols)] == w[: len(exact_cols)], k
        for gg, ww in zip(g[len(exact_cols):], w[len(exact_cols):]):
            if gg is None and ww is None:
                continue
            assert math.isclose(gg, ww, rel_tol=1e-9, abs_tol=1e-9), (k, gg, ww)
