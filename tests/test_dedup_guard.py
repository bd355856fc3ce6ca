"""Mega-bucket guard: candidate pair expansion stays bounded against
adversarial dup clusters, and the skip set is surfaced (never silent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from abs_log_spark.functions.similarity import candidate_pairs, oversized_buckets
from abs_log_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs


def _buckets(spark, mega_members: int, normal: int = 6):
    """band-bucket rows: one adversarial bucket with `mega_members` docs +
    one healthy bucket with `normal` docs."""
    mega = spark.range(mega_members).select(
        F.lit(0).alias("band"),
        F.lit("hot").alias("bucket"),
        F.concat(F.lit("m"), F.col("id")).alias("doc_id"),
    )
    ok = spark.range(normal).select(
        F.lit(1).alias("band"),
        F.lit("ok").alias("bucket"),
        F.concat(F.lit("n"), F.col("id")).alias("doc_id"),
    )
    return mega.unionByName(ok)


def test_candidate_pairs_capped_skips_mega_bucket(spark):
    """A 10k-member bucket would expand to ~50M pairs in one row; with the
    cap it is anti-joined away BEFORE any member list is built, and only the
    healthy bucket's pairs come out."""
    b = _buckets(spark, mega_members=10_000, normal=6)
    pairs = candidate_pairs(b, max_bucket_size=100).collect()
    assert len(pairs) == 6 * 5 // 2
    assert all(r.doc_a.startswith("n") for r in pairs)

    skipped = oversized_buckets(b, 100).collect()
    assert len(skipped) == 1
    assert skipped[0].n_members == 10_000


def test_candidate_pairs_uncapped_unchanged(spark):
    """Without a cap the expansion math is untouched (n choose 2)."""
    b = _buckets(spark, mega_members=50, normal=4)
    n = candidate_pairs(b).count()
    assert n == 50 * 49 // 2 + 4 * 3 // 2


def test_minhash_cap_plumbs_through(spark):
    """minhash_lsh_pairs with a cap drops an exact-dup mega-cluster's pairs
    but keeps genuine near-dup pairs; persisted_out hands back the cache."""
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha bravo charlie delta echo foxtrot golf hotel item"),
            F.lit(" word"), F.col("id"),
        ).alias("text"),
    )
    # 40 exact copies of one text -> one mega bucket per band
    mega = spark.range(40).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.lit("zulu yankee xray whiskey victor uniform tango sierra").alias("text"),
    )
    alld = docs.unionByName(mega)
    # uncapped: the mega cluster floods the output with jaccard-1.0 pairs
    uncapped = minhash_lsh_pairs(alld, min_jaccard=0.5).collect()
    mega_pairs = [r for r in uncapped if r.doc_a >= 1000]
    assert len(mega_pairs) == 40 * 39 // 2

    handle: list = []
    capped = minhash_lsh_pairs(
        alld, min_jaccard=0.5, max_bucket_size=35, persisted_out=handle
    ).collect()
    # the mega cluster is capped away; every other pair is untouched
    assert all(r.doc_a < 1000 and r.doc_b < 1000 for r in capped)
    assert sorted(map(tuple, capped)) == sorted(
        tuple(r) for r in uncapped if r.doc_a < 1000
    )
    assert len(handle) == 2  # shingle relation + band-bucket relation
    for h in handle:
        h.unpersist()


def test_cache_registry_releases_persisted_intermediates(spark):
    """Un-owned operator persists (no persisted_out) land in the session
    cache registry; release_all() after materialization leaves NO cached
    RDD behind — the bench loop's per-query hygiene."""
    from abs_log_spark import cache
    from abs_log_spark.operators.dedup import with_near_dup_copies

    def storage_count():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    cache.release_all()
    before = storage_count()
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("one two three four five six seven word"),
                 F.col("id")).alias("text"),
    )
    minhash_lsh_pairs(with_near_dup_copies(docs)).count()
    simhash_pairs(with_near_dup_copies(docs)).count()
    assert storage_count() > before  # the caches exist while un-released
    released = cache.release_all()
    assert released == 4  # shingles + band buckets, signatures + chunks
    assert storage_count() <= before


def _with_10k_cluster(spark):
    """30 distinct docs + a 10,000-copy exact-dup cluster: identical minhash
    signatures AND identical simhashes -> one mega bucket per band / chunk
    position. Uncapped, either family would build a ~50M-pair array in one
    row."""
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha bravo charlie delta echo foxtrot golf hotel item"),
            F.lit(" word"), F.col("id"),
        ).alias("text"),
    )
    mega = spark.range(10_000).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.lit("zulu yankee xray whiskey victor uniform tango sierra").alias("text"),
    )
    return docs.unionByName(mega)


def test_default_cap_survives_10k_cluster_minhash(spark):
    """The DEFAULT entry point (no explicit cap) must complete against a 10k
    exact-dup cluster AND report what it skipped: 4 bands x one 10k-member
    bucket."""
    skipped: list = []
    handle: list = []
    pairs = minhash_lsh_pairs(
        _with_10k_cluster(spark), persisted_out=handle, skipped_out=skipped
    ).collect()
    assert all(r.doc_a < 1000 and r.doc_b < 1000 for r in pairs)
    assert len(skipped) == 1
    rows = skipped[0].collect()
    assert len(rows) == 4 and all(r.n_members == 10_000 for r in rows)
    for h in handle:
        h.unpersist()


def test_default_cap_survives_10k_cluster_simhash(spark):
    """Same adversarial input through the SimHash family: 4 chunk positions
    x one 10k-member bucket skipped, query completes, skip counts surfaced."""
    skipped: list = []
    handle: list = []
    pairs = simhash_pairs(
        _with_10k_cluster(spark), persisted_out=handle, skipped_out=skipped
    ).collect()
    assert all(r.doc_a < 1000 and r.doc_b < 1000 for r in pairs)
    assert len(skipped) == 1
    rows = skipped[0].collect()
    assert len(rows) == 4 and all(r.n_members == 10_000 for r in rows)
    for h in handle:
        h.unpersist()


def test_hashed_ids_match_string_reference_formulation(spark):
    """The 60-bit hashed-shingle formulation (hashed_shingle_ids, commit
    4d8b006) must produce the IDENTICAL pair set and jaccard values as a
    reference pipeline built on raw shingle strings — the pre-optimization
    formulation: string shingles persisted, minhash base hashed per
    signature via md5's first 8 hex digits, verify over string arrays.
    Pins both the shiftright(u, 28) == conv(md5[1:8]) arithmetic and the
    claim that hashing changes bytes-on-the-wire, never semantics."""
    from abs_log_spark.functions.similarity import (
        _U_TO_G_SHIFT,
        band_buckets,
        hashed_shingle_ids,
        jaccard_from_arrays,
        minhash_signature_arr,
        shingles_col,
    )
    from abs_log_spark.operators.dedup import with_near_dup_copies

    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("the quick brown fox jumps over the lazy dog near"),
            F.col("id").cast("string"),
            F.lit("and then some filler words follow here for shingling"),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )
    alld = with_near_dup_copies(docs)

    # reference: raw-string shingles end to end (md5 path inside
    # minhash_signature_arr, string-array exact-Jaccard verify)
    sh_str = alld.select("doc_id", shingles_col(F.col("text")).alias("sh"))
    cand_ref = candidate_pairs(band_buckets(minhash_signature_arr(sh_str)), 512)
    ref = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_from_arrays(cand_ref, sh_str)
        .where(F.col("jaccard") >= 0.5)
        .collect()
    }

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(alld, min_jaccard=0.5).collect()
    }
    assert got == ref and len(got) > 0

    # the arithmetic identity itself: top 32 bits of the 60-bit id ARE the
    # first-8-hex-digit hash, as exact multisets
    a = alld.select(
        F.explode(
            F.transform(
                hashed_shingle_ids(F.col("text")),
                lambda u: F.shiftright(u, _U_TO_G_SHIFT),
            )
        ).alias("g")
    )
    b = alld.select(
        F.explode(
            F.transform(
                shingles_col(F.col("text")),
                lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
            )
        ).alias("g")
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
