"""Approximate-nearest-neighbor + embedding near-dup over array<float> columns.

- brute_force_knn: exact cosine top-k — the correctness baseline. Scale
  shape: broadcast the (small) query set against the full corpus; one pass,
  no shuffle except the final per-query top-k (TakeOrdered-style window).
- blocked_near_dup: all-pairs restricted to a blocking key (here ``label``;
  in production an IVF/LSH bucket id) — the standard way to keep pair count
  at O(sum block^2) instead of O(N^2).
- lsh_bucket_knn: the scale path — deterministic hyperplane LSH buckets
  (hyperplane signs derived from md5 of the dimension index, so the oracle
  can reproduce them), search only within the query's bucket.

All math is double-cast so DuckDB (::DOUBLE[]) agrees to 1e-6.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

from abs_log_spark.functions.similarity import cosine_col


def brute_force_knn(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``emb``: (vec_id, embedding); ``queries``: (q_id, q_embedding).
    Excludes self-matches. Deterministic ties: vec_id ascending.
    """
    joined = emb.crossJoin(F.broadcast(queries)).where(F.col("vec_id") != F.col("q_id"))
    scored = joined.select(
        "q_id",
        "vec_id",
        F.round(cosine_col(F.col("q_embedding"), F.col("embedding")), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def blocked_near_dup(
    emb: DataFrame, block_col: str = "label", min_cosine: float = 0.99
) -> DataFrame:
    """Embedding-cosine near-dup pairs within blocks (labels / LSH buckets)."""
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine_col(F.col("a.embedding"), F.col("b.embedding")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )


def _pm1_weights(prefix: str, dim: int) -> list[float]:
    """Precomputed +-1 weight vector: +1 iff the first hex char of
    md5('<prefix>|<d>') is < '8'. These are CONSTANTS of the scheme — the
    previous formulation recomputed dim x lists md5s per ROW inside the JVM
    expression (measured 20s at 60k x 64d x 16 lists); literal arrays make
    the dot a pure zip_with. The SQL oracle keeps the md5 formulation —
    equality of results proves the constants match."""
    return [
        1.0 if hashlib.md5(f"{prefix}|{d}".encode()).hexdigest()[0] < "8" else -1.0
        for d in range(dim)
    ]


def _dot_with_weights(embedding, weights: list[float]):
    w = F.array(*[F.lit(x) for x in weights])
    return F.aggregate(
        F.zip_with(embedding, w, lambda x, wv: x.cast("double") * wv),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_sign_expr(embedding, plane: int, dim: int = 64):
    """Deterministic pseudo-hyperplane: weight for dim d is +1 if the first
    hex char of md5('<plane>|<d>') is < '8' else -1. Reproducible in SQL."""
    proj = _dot_with_weights(embedding, _pm1_weights(str(plane), dim))
    return F.when(proj > 0, F.lit("1")).otherwise(F.lit("0"))


def _guard_dim(embedding, expr, dim: int):
    """Fail LOUDLY on an embedding whose length differs from the scheme's
    ``dim``: the +-1 weight vectors are length-``dim`` constants, and
    zip_with silently null-pads a shorter side — without this guard a dim
    mismatch collapses every sign to '0' / every score to NULL instead of
    erroring."""
    return F.when(F.size(embedding) == dim, expr).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"embedding dimension != {dim}: got "),
                F.size(embedding).cast("string"),
            )
        )
    )


def lsh_bucket_col(embedding, planes: int = 4, dim: int = 64):
    """Concatenated hyperplane signs -> 2^planes buckets."""
    bucket = F.concat(*[hyperplane_sign_expr(embedding, p, dim) for p in range(planes)])
    return _guard_dim(embedding, bucket, dim)


def lsh_bucket_knn(
    emb: DataFrame, queries: DataFrame, k: int = 5, planes: int = 4, dim: int = 64
) -> DataFrame:
    """ANN: search only vectors in the query's LSH bucket. Trades recall for
    a 2^planes candidate reduction; at 100 TB the bucket id becomes the
    table's partition key so a query touches one partition."""
    e = emb.withColumn("bucket", lsh_bucket_col(F.col("embedding"), planes, dim))
    q = queries.withColumn("bucket", lsh_bucket_col(F.col("q_embedding"), planes, dim))
    joined = e.join(F.broadcast(q), "bucket").where(F.col("vec_id") != F.col("q_id"))
    scored = joined.select(
        "q_id",
        "vec_id",
        F.round(cosine_col(F.col("q_embedding"), F.col("embedding")), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def centroid_dot_expr(embedding, l: int, dim: int = 64):
    """dot(embedding, pseudo-centroid l): centroid weight for dim d is +-1
    by the first hex char of md5('ivf<l>|<d>') — deterministic constants,
    materialized as literal arrays (see _pm1_weights)."""
    return _dot_with_weights(embedding, _pm1_weights(f"ivf{l}", dim))


def ivf_probe_knn(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVF search: corpus vectors live in their argmax-centroid list; a query
    probes its ``nprobe`` best lists and scores only those vectors — the
    full IVF shape (assign -> partition by list -> probe) minus k-means
    training. At 100 TB ``ivf_list`` is the table partition key, so a query
    scans nprobe/n_lists of the data; the query side is tiny and broadcast.
    """
    e = centroid_ivf_assign(emb, n_lists, dim)
    scores = F.array(
        *[
            F.struct(
                centroid_dot_expr(F.col("q_embedding"), l, dim).alias("s"),
                F.lit(l).alias("l"),
            )
            for l in range(n_lists)
        ]
    )
    # sort_array desc on struct(s, l): ties break by l DESC (mirrored in SQL)
    probes = F.slice(F.sort_array(scores, asc=False), 1, nprobe)
    q = queries.withColumn(
        "ivf_list",
        F.explode(
            _guard_dim(
                F.col("q_embedding"), F.transform(probes, lambda x: x["l"]), dim
            )
        ),
    )
    joined = e.join(F.broadcast(q), "ivf_list").where(F.col("vec_id") != F.col("q_id"))
    scored = joined.select(
        "q_id",
        "vec_id",
        F.round(cosine_col(F.col("q_embedding"), F.col("embedding")), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def _quantized_col(embedding):
    """Embedding values quantized to 1e-4 as BIGINTs: centroid updates sum
    these EXACT integers, so the mean is order-independent — the one place
    naive double sums would diverge between engines (shuffle-order float
    addition) lands on exact arithmetic instead."""
    return F.transform(
        embedding, lambda x: F.round(x.cast("double") * 10000).cast("long")
    )


def _kmeans_assign(emb: DataFrame, cents: dict[int, list[float]], dim: int) -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2 argmin, ties ->
    lowest list id). Centroids are literal arrays (driver-held, n_lists x dim
    doubles — bounded like any broadcast dim table); distance comparison uses
    the monotone form argmax(x.c - 0.5*c.c) so both engines compute it from
    the ONE float primitive already proven identical (sequential dot)."""
    score_cols = []
    for l in sorted(cents):
        c = cents[l]
        half_cc = 0.5 * sum(v * v for v in c)
        score_cols.append(_dot_with_weights(F.col("embedding"), c) - F.lit(half_cc))
    scores = F.array(*score_cols)
    best = (
        F.element_at(
            F.transform(
                F.array(scores), lambda sc: F.array_position(sc, F.array_max(sc))
            ),
            1,
        )
        - 1
    )
    lists = F.array(*[F.lit(l) for l in sorted(cents)])
    assigned = F.element_at(lists, best.cast("int") + 1)
    return emb.withColumn(
        "ivf_list", _guard_dim(F.col("embedding"), assigned.cast("int"), dim)
    )


def kmeans_ivf_assign(
    emb: DataFrame, n_lists: int = 8, iters: int = 2, dim: int = 64
) -> DataFrame:
    """IVF assignment with TRAINED centroids: fixed-iteration Lloyd k-means,
    deterministically seeded (centroid l initialized from the embedding of
    ``vec_id = l``), run as a DataFrame loop — the full IVF story
    (:func:`centroid_ivf_assign` is the same routing shape with pseudo-
    centroids).

    Same fixed-iteration discipline as ``near_dup_clusters``: BOTH engines
    (this and the DuckDB oracle) replay the identical ``iters`` update
    rounds, so parity holds independent of convergence. Per round: one
    distributed argmin assignment (no shuffle beyond the centroid-update
    aggregate), one groupBy(n_lists) update whose per-dimension sums are
    over 1e-4-quantized BIGINTs (exact, order-independent — see
    ``_quantized_col``), then the tiny (n_lists x dim) centroid table is
    collected to the driver and rebroadcast as literals, exactly how a
    cluster k-means iterates. A list that loses all members keeps its
    previous centroid (both engines see identical membership, so this is
    deterministic too).
    """
    with_q = emb.withColumn("qv", _quantized_col(F.col("embedding")))
    init = {
        int(r.vec_id): [v / 10000.0 for v in r.qv]
        for r in with_q.where(F.col("vec_id") < n_lists).select("vec_id", "qv").collect()
    }
    cents = dict(init)
    for _ in range(iters):
        assigned = _kmeans_assign(with_q, cents, dim)
        upd = assigned.groupBy("ivf_list").agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("qv", d + 1)).alias(f"s{d}") for d in range(dim)],
        )
        new_cents = dict(cents)  # empty lists keep their previous centroid
        for r in upd.collect():
            new_cents[int(r.ivf_list)] = [
                (r[f"s{d}"] / r.n) / 10000.0 for d in range(dim)
            ]
        cents = new_cents
    return _kmeans_assign(emb, cents, dim)


def centroid_ivf_assign(emb: DataFrame, n_lists: int = 16, dim: int = 64) -> DataFrame:
    """IVF-style list assignment with deterministic 'centroids': list id =
    argmax over n_lists of dot(embedding, pseudo-centroid(l)) where the
    pseudo-centroid is the +-1 hyperplane of md5('ivf<l>|<d>'). Stands in
    for k-means centroids (which need training); the routing/plumbing —
    assign, partition by list, probe nearest lists — is the real shape."""
    scores = F.array(
        *[centroid_dot_expr(F.col("embedding"), l, dim) for l in range(n_lists)]
    )
    # first max wins ties (lowest l) — matches the oracle's ORDER BY s DESC, l.
    # scores is bound once via a 1-element transform: array_position +
    # array_max would otherwise each evaluate all n_lists dot products.
    best = (
        F.element_at(
            F.transform(
                F.array(scores), lambda sc: F.array_position(sc, F.array_max(sc))
            ),
            1,
        )
        - 1
    )
    return emb.withColumn(
        "ivf_list", _guard_dim(F.col("embedding"), best.cast("int"), dim)
    )
