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


def test_log_show_ip_excludes_invalid_rows(spark):
    """[PK] log_show ip counts PARSED hits per source; invalid lines have no
    attributable request and must not inflate per-source hits."""
    import sys, os  # noqa: E401

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jobs.log_show import build_view

    rows = [
        ("src0", 100, True), ("src0", 100, True), ("src0", None, False),
        ("src1", 50, True), ("src1", None, False), ("src1", None, False),
    ]
    df = spark.createDataFrame(rows, "source string, bytes long, valid boolean")
    out = {r.source: (r.hits, r.bytes) for r in build_view(df, "ip").collect()}
    assert out == {"src0": (2, 200), "src1": (1, 50)}


def test_log_show_detail_filters_uri_and_invalid(spark):
    import sys, os  # noqa: E401

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jobs.log_show import build_view

    rows = [
        ("/search", "q=*", 10, 0.5, True),
        ("/search", "q=*", 20, 0.5, True),
        ("/search", "id=*", 30, 0.5, True),
        ("/item/*", "q=*", 40, 0.5, True),
        (None, None, None, None, False),
    ]
    df = spark.createDataFrame(
        rows, "uri_abs string, args_abs string, bytes long, rt double, valid boolean"
    )
    out = build_view(df, "detail", uri="/search").collect()
    got = {(r.uri_abs, r.args_abs): (r.hits, r.hits_pct) for r in out}
    assert got == {("/search", "q=*"): (2, 66.6667), ("/search", "id=*"): (1, 33.3333)}


def test_log_show_error_pivot_layout(spark):
    import sys, os  # noqa: E401

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jobs.log_show import build_view

    rows = [
        ("s", "2024-01-01 00:00:00", 404, 3),
        ("s", "2024-01-01 00:00:00", 500, 1),
        ("s", "2024-01-01 00:01:00", 404, 2),
    ]
    df = spark.createDataFrame(
        rows, "sink string, minute string, status int, hits long"
    ).withColumn("minute", F.to_timestamp("minute"))
    out = build_view(df, "error", pivot=True).collect()
    assert [r["404"] for r in out] == [3, 2]
    assert [r["500"] for r in out] == [1, 0]  # absent combo filled with 0


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


def test_expire_summary_day_partitioned(spark, tmp_catalog):
    """Day-partitioned retention: whole sub-cutoff day dirs drop as file
    ops, ONLY the boundary day is rewritten (newer day files untouched),
    and null-minute invalid groups never age out (P3 invariant)."""
    import os

    rows = []
    for day in (1, 2, 3):
        for h in (6, 18):
            rows.append((f"2024-01-0{day} {h:02d}:00:00", day * 100 + h))
    df = (
        spark.createDataFrame(rows, "minute string, pv long")
        .withColumn("minute", F.to_timestamp("minute"))
        .unionByName(
            spark.createDataFrame([(None, 7)], "minute string, pv long")
            .withColumn("minute", F.to_timestamp("minute"))
        )
        .withColumn("day", F.to_date("minute"))
    )
    tmp_catalog.write(df, "minute_agg_x", partition_by=("day",))
    newer = os.path.join(tmp_catalog.path("minute_agg_x"), "day=2024-01-03")
    files_before = sorted(os.listdir(newer))

    res = expire_summary(spark, tmp_catalog, "minute_agg_x", "2024-01-02 12:00:00")
    assert res == {"kept": 4, "dropped": 3}  # 2 on day3, 1 boundary, 1 null kept
    root = tmp_catalog.path("minute_agg_x")
    assert not os.path.isdir(os.path.join(root, "day=2024-01-01"))
    assert sorted(os.listdir(newer)) == files_before  # untouched, not rewritten
    pvs = sorted(r.pv for r in tmp_catalog.read(spark, "minute_agg_x").collect())
    assert pvs == [7, 218, 306, 318]  # null group + boundary evening + day3


def test_expire_buckets_keeps_all_state_consistent(spark, tmp_catalog):
    """Expiring buckets must drop routed data, histogram partials, AND
    checkpoint rows together, then rebuild summaries — otherwise the next
    merge resurrects expired data or a re-ingest silently skips."""
    from abs_log_spark.operators.retention import expire_buckets
    from abs_log_spark.plans import checkpoint as ckpt
    from abs_log_spark.plans.pipeline import PipelineConfig, run_pipeline
    from abs_log_spark.sources.synth import gen_sequences, gen_sources_dim

    seq = gen_sequences(spark, 600, invalid_every=10)
    dim = gen_sources_dim(spark)
    # auto_compact off: this test asserts the PER-BUCKET partition drops;
    # the consolidated-partition expiry path is covered by
    # tests/test_compaction.py::test_expire_compacted_bucket_subtracts_exactly
    run_pipeline(spark, tmp_catalog, seq, dim, run_id="r1",
                 cfg=PipelineConfig(auto_compact=False))
    pv_all = sum(
        tmp_catalog.read(spark, f"minute_agg_{s}").agg(F.sum("pv")).collect()[0][0]
        for s in ("sink_a", "sink_b", "sink_c")
        if tmp_catalog.exists(f"minute_agg_{s}")
    )

    res = expire_buckets(spark, tmp_catalog, ["0", "1"])
    assert res["partials_partitions"] == 2 and res["checkpoint_rows"] == 2
    assert res["routed_partitions"] >= 2
    assert ckpt.completed_partitions(spark, tmp_catalog, "routed") == {
        "2", "3", "4", "5", "6", "7"
    }
    pv_after = sum(
        tmp_catalog.read(spark, f"minute_agg_{s}").agg(F.sum("pv")).collect()[0][0]
        for s in ("sink_a", "sink_b", "sink_c")
        if tmp_catalog.exists(f"minute_agg_{s}")
    )
    # ground truth: pv counts exactly the VALID rows of the surviving buckets
    from abs_log_spark.plans.pipeline import transform

    valid_expired = (
        transform(seq.where("part_bucket < 2"), dim).where("valid").count()
    )
    assert valid_expired > 0
    assert pv_after == pv_all - valid_expired

    # re-ingesting the expired buckets reprocesses them (checkpoint cleared)
    r2 = run_pipeline(spark, tmp_catalog, seq, dim, run_id="r2")
    assert r2["buckets_processed"] == 2
    pv_back = sum(
        tmp_catalog.read(spark, f"minute_agg_{s}").agg(F.sum("pv")).collect()[0][0]
        for s in ("sink_a", "sink_b", "sink_c")
        if tmp_catalog.exists(f"minute_agg_{s}")
    )
    assert pv_back == pv_all


def test_summary_tables_day_partitioned_and_pruned(spark, tmp_catalog):
    """Summary tables carry a day=date(minute) partition: a time-ranged
    report prunes whole partition directories (PartitionFilters) instead of
    row-filtering all summary files; null-minute invalid groups survive the
    round trip in the null partition."""
    import datetime

    from abs_log_spark.plans.pipeline import run_pipeline
    from abs_log_spark.sources.synth import gen_sequences, gen_sources_dim

    seq = gen_sequences(spark, 600, invalid_every=10)
    dim = gen_sources_dim(spark)
    run_pipeline(spark, tmp_catalog, seq, dim, run_id="r1")

    df = tmp_catalog.read(spark, "minute_agg_sink_a")
    assert "day" in df.columns
    # layout on disk: day= dirs under the table root
    import os

    assert any(
        d.startswith("day=") for d in os.listdir(tmp_catalog.path("minute_agg_sink_a"))
    )
    ranged = df.where(F.col("day") >= F.lit(datetime.date(2024, 1, 1)))
    plan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "day" in plan.split("PartitionFilters", 1)[1][:220]
    # invalid-line group (null minute -> null day partition) is intact
    inv = sum(
        tmp_catalog.read(spark, f"minute_agg_{s}")
        .where(F.col("minute").isNull())
        .agg(F.coalesce(F.sum("invalid_hits"), F.lit(0))).first()[0]
        for s in ("sink_a", "sink_b", "sink_c")
        if tmp_catalog.exists(f"minute_agg_{s}")
    )
    assert inv == 600 // 10


def test_expire_checkpoint_rewrite_uses_anti_join_above_threshold(spark, tmp_catalog):
    """Expiring thousands of buckets must not build a thousands-deep NOT-isin
    chain over the checkpoint: above ISIN_MAX_KEYS the rewrite plans a
    broadcast anti-join (same switch as resume's filter_pending)."""
    from abs_log_spark.operators.retention import expire_buckets
    from abs_log_spark.plans.checkpoint import ISIN_MAX_KEYS, filter_pending
    from abs_log_spark.plans import checkpoint as ckpt

    n = ISIN_MAX_KEYS + 36
    ckpt.mark_done(spark, tmp_catalog, "r1", "routed", [str(k) for k in range(n + 5)])
    # plan evidence on the exact expression expire_buckets uses
    ck = tmp_catalog.read(spark, ckpt.CHECKPOINT_TABLE)
    keep = filter_pending(ck, {str(k) for k in range(n)}, key_col="partition_key")
    plan = keep._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    # end-to-end: the rewrite keeps exactly the unexpired rows
    res = expire_buckets(spark, tmp_catalog, [str(k) for k in range(n)])
    assert res["checkpoint_rows"] == n
    assert ckpt.completed_partitions(spark, tmp_catalog, "routed") == {
        str(k) for k in range(n, n + 5)
    }


def test_expire_routed_buckets(spark, tmp_catalog):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("part_bucket")
    )
    tmp_catalog.write(df, "routed_x", partition_by=("part_bucket",))
    assert expire_routed_buckets(tmp_catalog, "routed_x", ["0", "2"]) == 2
    left = tmp_catalog.read(spark, "routed_x")
    assert set(r[0] for r in left.select("part_bucket").distinct().collect()) == {1, 3}


def _day_table(spark, tmp_catalog, name):
    rows = []
    for day in (1, 2, 3):
        for h in (6, 18):
            rows.append((f"2024-01-0{day} {h:02d}:00:00", day * 100 + h))
    df = (
        spark.createDataFrame(rows, "minute string, pv long")
        .withColumn("minute", F.to_timestamp("minute"))
        .withColumn("day", F.to_date("minute"))
    )
    tmp_catalog.write(df, name, partition_by=("day",))
    return df


def test_expire_boundary_swap_crash_recovers(spark, tmp_catalog):
    """Round-3 ADVICE (medium): a crash between the boundary day's
    move-aside and the staged move-in must NOT lose the kept rows. Simulate
    the exact window — staging written, boundary dir tombstoned, promote
    never ran — and assert the next expire_summary invocation restores the
    kept rows before re-applying the cutoff."""
    import os
    import shutil as sh

    from abs_log_spark.operators.retention import recover_retention

    _day_table(spark, tmp_catalog, "minute_agg_c")
    root = tmp_catalog.path("minute_agg_c")
    cutoff = "2024-01-02 12:00:00"

    # reproduce expire_summary's on-disk state at the crash point:
    # old days dropped, staging holds the kept boundary rows (day=2024-01-02
    # evening), boundary dir moved aside to the tombstone, promote pending
    sh.rmtree(os.path.join(root, "day=2024-01-01"))
    df = tmp_catalog.read(spark, "minute_agg_c")
    keep = df.where("day = DATE '2024-01-02' and minute >= TIMESTAMP '2024-01-02 12:00:00'")
    tmp_catalog.write(keep.coalesce(1), "_minute_agg_c_retention_staging",
                      partition_by=("day",))
    os.replace(
        os.path.join(root, "day=2024-01-02"),
        os.path.join(root, ".day=2024-01-02.tombstone"),
    )

    # crash-state reads: Spark skips the dot-dir; boundary rows are absent
    assert tmp_catalog.read(spark, "minute_agg_c").count() == 2  # day3 only

    res = expire_summary(spark, tmp_catalog, "minute_agg_c", cutoff)
    assert res == {"kept": 3, "dropped": 0}  # kept rows restored, no re-drop
    pvs = sorted(r.pv for r in tmp_catalog.read(spark, "minute_agg_c").collect())
    assert pvs == [218, 306, 318]
    assert not os.path.isdir(os.path.join(root, ".day=2024-01-02.tombstone"))
    assert not os.path.isdir(tmp_catalog.path("_minute_agg_c_retention_staging"))

    # idempotence: recovery with nothing pending is a no-op
    recover_retention(tmp_catalog, "minute_agg_c")
    assert sorted(r.pv for r in tmp_catalog.read(spark, "minute_agg_c").collect()) == pvs


def test_expire_unpartitioned_swap_crash_recovers(spark, tmp_catalog):
    """Whole-table replace (unpartitioned layout): crash after the table
    moved aside but before staging moved in — recovery promotes staging
    (the kept rows), never resurrects dropped rows or loses kept ones."""
    import os

    from abs_log_spark.operators.retention import recover_retention

    df = spark.range(10).select(
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(mins=F.col("id").cast("int"))).alias("minute"),
        F.col("id").alias("pv"),
    )
    tmp_catalog.write(df, "minute_agg_u")
    keep = df.where("pv >= 4")
    tmp_catalog.write(keep.coalesce(1), "_minute_agg_u_retention_staging")
    os.replace(
        tmp_catalog.path("minute_agg_u"),
        tmp_catalog.path(".minute_agg_u.tombstone"),
    )
    recover_retention(tmp_catalog, "minute_agg_u")
    assert sorted(r.pv for r in tmp_catalog.read(spark, "minute_agg_u").collect()) == [
        4, 5, 6, 7, 8, 9
    ]
    assert not os.path.isdir(tmp_catalog.path(".minute_agg_u.tombstone"))


def test_checkpoint_swap_crash_heals_before_any_consumer(spark, tmp_catalog):
    """Round-4 ADVICE (medium): a crash inside expire_buckets'
    checkpoint-table _replace_table window (live table tombstoned, staging
    not yet promoted) must not silently discard the pre-crash lineage. The
    failure mode: completed_partitions sees no table -> full re-ingest, and
    mark_done's append RECREATES the live table, after which recovery
    classifies the swap complete and deletes the tombstone (rows gone for
    good). Both checkpoint consumers now heal the swap first."""
    import os

    from abs_log_spark.plans import checkpoint as ckpt

    ckpt.mark_done(spark, tmp_catalog, "r1", "routed", ["0", "1", "2"])
    keep = (
        tmp_catalog.read(spark, ckpt.CHECKPOINT_TABLE)
        .where(F.col("partition_key") != "2")
    )
    tmp_catalog.write(keep, "_checkpoint_retention_staging")
    # crash point: live moved aside, staging (kept rows) never promoted
    os.replace(
        tmp_catalog.path(ckpt.CHECKPOINT_TABLE),
        tmp_catalog.path(".checkpoint.tombstone"),
    )

    # reader heals first: resume sees the kept lineage, not an empty table
    assert ckpt.completed_partitions(spark, tmp_catalog, "routed") == {"0", "1"}
    assert not os.path.isdir(tmp_catalog.path(".checkpoint.tombstone"))

    # writer path from the same crash state: append must not recreate a
    # fresh table over a stranded swap
    os.replace(
        tmp_catalog.path(ckpt.CHECKPOINT_TABLE),
        tmp_catalog.path(".checkpoint.tombstone"),
    )
    ckpt.mark_done(spark, tmp_catalog, "r2", "routed", ["3"])
    assert ckpt.completed_partitions(spark, tmp_catalog, "routed") == {
        "0", "1", "3"
    }
    assert not os.path.isdir(tmp_catalog.path(".checkpoint.tombstone"))
