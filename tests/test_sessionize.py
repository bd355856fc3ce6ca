"""Stateful streaming sessionization (applyInPandasWithState) must agree
with the batch window-expression twin across micro-batch boundaries."""

from __future__ import annotations

import os

from pyspark.sql import Window, functions as F

from abs_log_spark.sources.readers import read_table
from abs_log_spark.streaming.sessionize import sessionize_batch, sessionize_stream

SF_DIR = "/root/testdata/sf0.001"


def _key(r):
    return (r["key"], r["session_start"], r["session_end"], r["n_events"])


def test_stream_sessions_equal_batch_closed_sessions(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events").select(
        F.col("user_id").cast("string").alias("user_id"), "ts"
    )
    # split the stream into time-ordered files so sessions cross micro-batch
    # boundaries (state must carry open sessions between batches). The file
    # source consumes files oldest-modtime-first, so write the slices
    # sequentially — in-order arrival, as a real log stream delivers.
    import time as _time

    input_dir = str(tmp_path / "stream_in")
    bounds = ["2024-01-08", "2024-01-16", "2024-01-24"]
    slices = [
        ev.where(F.col("ts") < bounds[0]),
        ev.where((F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1])),
        ev.where((F.col("ts") >= bounds[1]) & (F.col("ts") < bounds[2])),
        ev.where(F.col("ts") >= bounds[2]),
    ]
    for s in slices:
        s.coalesce(1).write.mode("append").parquet(input_dir)
        _time.sleep(0.05)

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    sess = sessionize_stream(stream, gap_minutes=30, key_col="user_id")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {_key(r) for r in spark.table("sessions").collect()}

    batch = sessionize_batch(ev, gap_minutes=30, key_col="user_id")
    # the stream emits a session only when a LATER event closes it; each
    # key's final session stays open in state -> batch minus per-key last
    w_last = batch.withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("key").orderBy(F.desc("session_end"))),
    )
    want = {_key(r) for r in w_last.where("_rk > 1").drop("_rk").collect()}

    assert got == want
    assert len(got) > 0
