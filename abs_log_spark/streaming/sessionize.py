"""Gap-based sessionization — batch (window exprs) + streaming
(``applyInPandasWithState`` custom stateful operator, SURVEY.md 2.10).

abs-log's ``ip`` view counts per-visitor activity; the session extension
groups a visitor's events into visits separated by an inactivity gap. Batch
is pure builtin window expressions (lag -> gap flag -> running sum = session
id), so it is DuckDB-oracle-checkable. The streaming twin carries the open
session per key in group state across micro-batches and emits sessions the
moment an in-stream gap closes them.

Scale notes: batch sessionize is one shuffle (partitionBy key) + one agg;
streaming state is O(|active keys|) x one open session — tiny. Inside the
state function everything is vectorized over the batch's rows per key
(numpy diff/cumsum, no per-row Python beyond the group loop Spark already
imposes).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "key string, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"  # epoch-us; timestamps don't round-trip state


def sessionize_batch(
    df: DataFrame, gap_minutes: int, key_col: str, ts_col: str = "ts"
) -> DataFrame:
    """Batch gap sessionization: lag -> new-session flag -> cumulative sum.

    Returns one row per (key, session): start, end, n_events.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    # exact integer microseconds (unix_timestamp truncates to seconds and
    # floats lose precision; DuckDB oracle twin uses epoch_us). cast to ltz
    # first: parquet TIMESTAMP_NTZ has no unix_micros.
    ep = F.unix_micros(F.col(ts_col).cast("timestamp"))
    new_sess = F.when(
        F.lag(ts_col).over(w).isNull() | (ep - F.lag(ep).over(w) > gap_us),
        1,
    ).otherwise(0)
    with_id = df.withColumn("_new", new_sess).withColumn(
        "_sess", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy(F.col(key_col).alias("key"), F.col("_sess"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("_sess")
    )


def _sessionize_state_fn(gap_us: int):
    """Build the applyInPandasWithState function for a gap (microseconds)."""

    def fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        pdf = pd.concat(list(pdfs)).sort_values("ts")
        ts = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        if len(ts) == 0:
            return
        if state.exists:
            s_start, s_last, s_n = state.get
        else:
            s_start = s_last = None
            s_n = 0

        closed: list[tuple] = []
        k = key[0]
        # the carried open session is closed by this batch's first event if
        # the gap exceeds the threshold — emit it NOW, don't lose it
        if s_last is not None and ts[0] - s_last > gap_us:
            closed.append((k, s_start, s_last, s_n))
            s_start = s_last = None
            s_n = 0

        # vectorized: break where the inter-event gap exceeds the threshold;
        # prepend the carried open session if it chains onto this batch.
        prev = np.concatenate(([s_last if s_last is not None else -(2**62)], ts[:-1]))
        new_flag = (ts - prev) > gap_us
        if s_last is None:
            new_flag[0] = True
        sess_ids = np.cumsum(new_flag)  # 0 = continuation of carried session
        n_sess = int(sess_ids[-1]) if len(sess_ids) else 0
        for sid in range(0, n_sess + 1):
            mask = sess_ids == sid
            if not mask.any():
                continue
            first, last = ts[mask][0], ts[mask][-1]
            n = int(mask.sum())
            if sid == 0:  # extends the carried open session
                start, n = s_start, s_n + n
            else:
                start = first
            if sid < n_sess:  # a later session in this batch closed it
                closed.append((k, start, last, n))
            else:  # still open -> back into state
                state.update((int(start), int(last), int(n)))
        if closed:
            out = pd.DataFrame(
                closed, columns=["key", "session_start", "session_end", "n_events"]
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return fn


def sessionize_stream(
    events: DataFrame, gap_minutes: int, key_col: str, ts_col: str = "ts"
) -> DataFrame:
    """Streaming sessionization: one open session per key held in group
    state across micro-batches; a session is emitted when a later event
    arrives more than ``gap_minutes`` after it ends (in-stream close).

    Production note: add an event-time timeout
    (``GroupStateTimeout.EventTimeTimeout`` + watermark) to also flush
    sessions that never see a successor; omitted here so results are
    deterministic under availableNow replay.
    """
    return (
        events.select(F.col(key_col).cast("string").alias("key"), F.col(ts_col).alias("ts"))
        .groupBy("key")
        .applyInPandasWithState(
            _sessionize_state_fn(gap_minutes * 60 * 1_000_000),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
