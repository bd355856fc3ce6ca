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


def test_simhash_feature_overflow_raises(spark):
    """A doc with > 32767 distinct shingles would overflow the packed 16-bit
    lanes and silently corrupt its signature; it must ERROR instead."""
    from abs_log_spark.functions.similarity import simhash_signature

    n_words = 32771  # 32769 distinct 3-gram shingles from distinct words
    big = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(n_words)),
                        lambda i: F.concat(F.lit("w"), i.cast("string"))),
            " ",
        ).alias("text"),
    )
    with pytest.raises(Exception, match="distinct"):
        simhash_signature(big).collect()
    # one word under the cap is fine
    ok = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(32769)),
                        lambda i: F.concat(F.lit("w"), i.cast("string"))),
            " ",
        ).alias("text"),
    )
    assert simhash_signature(ok).count() == 1


def test_filter_pending_null_keys_consistent(spark):
    """NULL keys must survive BOTH filter_pending paths identically (the
    isin form's NULL predicate used to silently drop them)."""
    df = spark.range(20).select(
        F.when(F.col("id") < 5, None).otherwise(F.col("id") % 10)
        .cast("int").alias("part_bucket")
    )
    small = {"1", "2"}
    large = {str(k) for k in range(ISIN_MAX_KEYS + 10)} - {"0"}
    n_null = 5
    got_small = filter_pending(df, small)
    got_large = filter_pending(df, large)
    assert got_small.where(F.col("part_bucket").isNull()).count() == n_null
    assert got_large.where(F.col("part_bucket").isNull()).count() == n_null


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
