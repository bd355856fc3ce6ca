"""Loud-failure guards: ANN dim mismatches error instead of silently
returning wrong results; long-history checkpoints use an anti-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from abs_log_spark.operators.ann import centroid_ivf_assign, lsh_bucket_knn
from abs_log_spark.plans.checkpoint import ISIN_MAX_KEYS, filter_pending


def _emb(spark, dim):
    return spark.range(6).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (i * (F.col("id") + 1)).cast("float") / 100,
        ).alias("embedding"),
    )


def test_ann_dim_mismatch_raises(spark):
    """A 3-dim embedding against the 64-dim scheme must ERROR (previously:
    zip_with null-padded, every sign collapsed to '0', scores went NULL)."""
    bad = _emb(spark, 3)
    with pytest.raises(Exception, match="dimension"):
        centroid_ivf_assign(bad).collect()
    q = bad.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding"))
    with pytest.raises(Exception, match="dimension"):
        lsh_bucket_knn(bad, q).collect()


def test_ann_dim_parameter_plumbs(spark):
    """Non-default dims work end-to-end when passed through."""
    e = _emb(spark, 8)
    assigned = centroid_ivf_assign(e, n_lists=4, dim=8).collect()
    assert len(assigned) == 6
    assert all(0 <= r.ivf_list < 4 for r in assigned)


def test_filter_pending_anti_join_for_large_done_sets(spark):
    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 200).cast("int").alias("part_bucket")
    )
    small = {str(k) for k in range(10)}
    large = {str(k) for k in range(ISIN_MAX_KEYS + 36)}  # 100 done buckets

    got_small = filter_pending(df, small).count()
    got_large = filter_pending(df, large).count()
    # brute-force expectation
    exp_small = df.where(~F.col("part_bucket").isin([int(k) for k in small])).count()
    exp_large = df.where(~F.col("part_bucket").isin([int(k) for k in large])).count()
    assert (got_small, got_large) == (exp_small, exp_large)
    # the large path is a broadcast anti-join, and no helper column leaks
    large_df = filter_pending(df, large)
    assert large_df.columns == df.columns
    plan = large_df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
