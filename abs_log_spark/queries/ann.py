"""Similarity-search queries over the embeddings table (array<float>):
brute-force cosine top-k baseline, LSH-bucketed ANN, blocked embedding
near-dup. See operators/ann.py for the scale rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from abs_log_spark.operators.ann import (
    blocked_near_dup,
    brute_force_knn,
    centroid_ivf_assign,
    ivf_probe_knn,
    kmeans_ivf_assign,
    lsh_bucket_knn,
)
from abs_log_spark.queries import register
from abs_log_spark.sources.readers import read_table

_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

_KNN_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5),
e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
scored AS (
  SELECT q_id, vec_id, {_COS.format(a='qe', b='ev')} AS cosine
  FROM q CROSS JOIN e WHERE vec_id <> q_id
)
SELECT q_id, vec_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register("ann_knn_bruteforce", _KNN_SQL)
def ann_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id<5 (the ANN baseline)."""
    emb = read_table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    return brute_force_knn(emb.select("vec_id", "embedding"), queries, k=5)


_PLANES_CTE = """
planes AS (
  SELECT p, list_transform(generate_series(0, 63),
           d -> CASE WHEN substr(md5(p::VARCHAR || '|' || d::VARCHAR), 1, 1) < '8'
                     THEN 1.0 ELSE -1.0 END) AS w
  FROM (SELECT unnest(generate_series(0, 3)) AS p)
)
"""

_LSH_KNN_SQL = f"""
WITH {_PLANES_CTE},
eb AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
sigs AS (
  SELECT vec_id,
         string_agg(CASE WHEN list_dot_product(ev, w) > 0 THEN '1' ELSE '0' END,
                    '' ORDER BY p) AS bucket
  FROM eb CROSS JOIN planes GROUP BY vec_id
),
q AS (SELECT s.vec_id AS q_id, e.ev AS qe, s.bucket
      FROM sigs s JOIN eb e ON e.vec_id = s.vec_id WHERE s.vec_id < 5),
cands AS (SELECT s.vec_id, e.ev, s.bucket FROM sigs s JOIN eb e ON e.vec_id = s.vec_id),
scored AS (
  SELECT q.q_id, c.vec_id, {_COS.format(a='q.qe', b='c.ev')} AS cosine
  FROM q JOIN cands c ON q.bucket = c.bucket AND c.vec_id <> q.q_id
)
SELECT q_id, vec_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register("ann_knn_lsh", _LSH_KNN_SQL)
def ann_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via deterministic hyperplane-LSH buckets (16 buckets, search only
    the query's bucket) — the scale path; recall vs the brute-force baseline
    is observable by comparing the two queries."""
    emb = read_table(spark, sf_dir, "embeddings", spread=True).select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    return lsh_bucket_knn(emb, queries, k=5, planes=4)


_NEAR_DUP_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 4 = 0
),
alle AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev, label FROM base
  UNION ALL
  SELECT vec_id + 1000000, list_prepend(-embedding[1], embedding[2:])::DOUBLE[], label
  FROM base
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.ev AS ea, b.ev AS eb
  FROM alle a JOIN alle b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM (
  SELECT vec_a, vec_b, {_COS.format(a='ea', b='eb')} AS cosine FROM pairs
) WHERE cosine >= 0.9
"""


@register("ann_near_dup_blocked", _NEAR_DUP_SQL)
def ann_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup within label blocks; known positives are
    first-element-negated copies (cos = 1 - 2*e0^2/|e|^2, typically > 0.9)."""
    emb = read_table(spark, sf_dir, "embeddings", spread=True).where(F.col("vec_id") % 4 == 0)
    e = F.col("embedding")
    mutated = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.array(-F.element_at(e, 1)), F.slice(e, 2, F.size(e) - 1)
        ).alias("embedding"),
        "label",
    )
    alle = emb.select("vec_id", "embedding", "label").unionByName(mutated)
    return blocked_near_dup(alle, block_col="label", min_cosine=0.9).select(
        "vec_a", "vec_b", "cosine"
    )


_IVF_ASSIGN_SQL = """
WITH cents AS (
  SELECT l, list_transform(generate_series(0, 63),
           d -> CASE WHEN substr(md5('ivf' || l::VARCHAR || '|' || d::VARCHAR), 1, 1) < '8'
                     THEN 1.0 ELSE -1.0 END) AS w
  FROM (SELECT unnest(generate_series(0, 15)) AS l)
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
scores AS (SELECT vec_id, l, list_dot_product(ev, w) AS s FROM e CROSS JOIN cents),
assign AS (
  SELECT vec_id, l AS ivf_list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l) AS rn
    FROM scores
  ) WHERE rn = 1
)
SELECT CAST(ivf_list AS INT) AS ivf_list,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(min(vec_id) AS BIGINT) AS min_vec_id
FROM assign GROUP BY 1
"""


@register("ann_ivf_assign", _IVF_ASSIGN_SQL)
def ann_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style list assignment (argmax over 16 deterministic pseudo-
    centroids) + per-list occupancy — the partition-routing half of an IVF
    index. The oracle restates the argmax as a row_number window over the
    same dot products (ties: first max wins = lowest l on both sides)."""
    emb = read_table(spark, sf_dir, "embeddings", spread=True).select("vec_id", "embedding")
    assigned = centroid_ivf_assign(emb, n_lists=16)
    return assigned.groupBy("ivf_list").agg(
        F.count("*").alias("n_vectors"),
        F.min("vec_id").cast("long").alias("min_vec_id"),
    )


#: One k-means assignment round as a SQL fragment: argmin squared-L2 in the
#: monotone form argmax(x.c - 0.5*c.c) — ONLY list_dot_product, the float
#: primitive already proven bit-identical to Spark's sequential fold.
def _KM_ASSIGN(name: str, src: str, cents: str) -> str:
    return f"""{name} AS (
  SELECT vec_id, l AS ivf_list, qv FROM (
    SELECT s.vec_id, c.l, s.qv,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY (list_dot_product(s.ev, c.cv)
                       - 0.5 * list_dot_product(c.cv, c.cv)) DESC, c.l) AS rn
    FROM {src} s CROSS JOIN {cents} c
  ) WHERE rn = 1
)"""


def _KM_UPDATE(m: str, c: str, assign: str, prev: str) -> str:
    return f"""{m} AS (
  SELECT ivf_list AS l, ds.d,
         CAST(sum(qv[ds.d]) AS DOUBLE) / count(*) / 10000.0 AS cv1
  FROM {assign} CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) ds
  GROUP BY 1, 2
),
{c} AS (
  SELECT l, list(cv1 ORDER BY ds_d) AS cv
  FROM (SELECT l, d AS ds_d, cv1 FROM {m}) GROUP BY 1
  UNION ALL
  SELECT l, cv FROM {prev} WHERE l NOT IN (SELECT l FROM {m})
)"""


_KMEANS_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
q AS (
  SELECT vec_id, ev,
         list_transform(ev, x -> CAST(round(x * 10000) AS BIGINT)) AS qv
  FROM e
),
c0 AS (
  SELECT CAST(vec_id AS INT) AS l, list_transform(qv, v -> v / 10000.0) AS cv
  FROM q WHERE vec_id < 8
),
{_KM_ASSIGN('a1', 'q', 'c0')},
{_KM_UPDATE('m1', 'c1', 'a1', 'c0')},
{_KM_ASSIGN('a2', 'q', 'c1')},
{_KM_UPDATE('m2', 'c2', 'a2', 'c1')},
{_KM_ASSIGN('a3', 'q', 'c2')}
SELECT CAST(ivf_list AS INT) AS ivf_list,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(min(vec_id) AS BIGINT) AS min_vec_id
FROM a3 GROUP BY 1
"""


@register("ann_ivf_kmeans_assign", _KMEANS_SQL)
def ann_ivf_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF assignment with TRAINED centroids: 2 fixed Lloyd iterations,
    seeded from the embeddings of vec_id < 8, centroid means over
    1e-4-quantized integer sums (exact, shuffle-order-independent). The
    oracle replays the IDENTICAL two iterations in SQL — parity proves the
    distributed train/assign loop bit-exact, independent of convergence."""
    emb = read_table(spark, sf_dir, "embeddings", spread=True).select("vec_id", "embedding")
    assigned = kmeans_ivf_assign(emb, n_lists=8, iters=2)
    return assigned.groupBy("ivf_list").agg(
        F.count("*").alias("n_vectors"),
        F.min("vec_id").cast("long").alias("min_vec_id"),
    )


_IVF_SQL = """
WITH cents AS (
  SELECT l, list_transform(generate_series(0, 63),
           d -> CASE WHEN substr(md5('ivf' || l::VARCHAR || '|' || d::VARCHAR), 1, 1) < '8'
                     THEN 1.0 ELSE -1.0 END) AS w
  FROM (SELECT unnest(generate_series(0, 15)) AS l)
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
scores AS (SELECT vec_id, l, list_dot_product(ev, w) AS s FROM e CROSS JOIN cents),
assign AS (
  SELECT vec_id, l AS ivf_list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l) AS rn
    FROM scores
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS q_id, l AS ivf_list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l DESC) AS rn
    FROM scores WHERE vec_id < 5
  ) WHERE rn <= 4
),
scored AS (
  SELECT p.q_id, a.vec_id,
         round(list_dot_product(qe.ev, ce.ev) /
               (sqrt(list_dot_product(qe.ev, qe.ev)) * sqrt(list_dot_product(ce.ev, ce.ev))), 6)
           AS cosine
  FROM probes p
  JOIN assign a ON a.ivf_list = p.ivf_list AND a.vec_id <> p.q_id
  JOIN e qe ON qe.vec_id = p.q_id
  JOIN e ce ON ce.vec_id = a.vec_id
)
SELECT q_id, vec_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register("ann_ivf_search", _IVF_SQL)
def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF search: assign corpus to 16 pseudo-centroid lists, probe the
    query's 4 best lists, exact cosine inside them — the standard
    recall/cost dial (nprobe/n_lists) over partition-pruned data."""
    emb = read_table(spark, sf_dir, "embeddings", spread=True).select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    return ivf_probe_knn(emb, queries, k=5, n_lists=16, nprobe=4)
