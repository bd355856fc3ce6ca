"""Deduplication queries: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Known positives are synthesized deterministically INSIDE each query (union
with exact or mutated copies at doc_id+1000000) so the detectors have
non-trivial output; the oracle applies the identical union. See
operators/dedup.py for the scale rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from abs_log_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    simhash_pairs,
    with_near_dup_copies,
)
from abs_log_spark.queries import register
from abs_log_spark.sources.readers import read_table

_EXACT_SQL = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents
)
SELECT md5(text) AS fingerprint,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM all_docs
GROUP BY 1
"""


@register("dedup_exact_md5", _EXACT_SQL)
def dedup_exact_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy on md5(text)): every doc gets an exact copy
    at doc_id+1e6; the survivor must be the original (min id)."""
    # no spread here: md5-per-row is cheap relative to shuffling the text,
    # and the fingerprint groupBy is the query's only real work (measured:
    # spread made this query 0.55 -> 1.43 s at sf1.0)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return dedup_exact(docs.unionByName(copies))


from abs_log_spark.operators.dedup import DEFAULT_MAX_BUCKET_SIZE as _CAP

#: The shared shingle/minhash CTE pipeline, also used by the jaccard oracle.
#: States the SAME default mega-bucket cap as the Spark path (buckets with
#: more than DEFAULT_MAX_BUCKET_SIZE members produce no candidate pairs), so
#: the guard is checked semantics on both engines, not a silent divergence.
#: Identities mirror the Spark operator's compact forms EXACTLY
#: (hashed_shingle_ids / band_buckets): the per-shingle id ``u`` = first 15
#: md5 hex digits as BIGINT (also the verify identity ``ds.s``); the
#: minhash base = ``u // 2^28`` = the first 8 digits; bucket = first 15 hex
#: digits of the band md5 as BIGINT — so a hash collision, were one ever
#: to occur, is shared by both engines rather than a parity divergence.
_MINHASH_CTES = f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' zqx zqy zqz' FROM documents
),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM all_docs),
sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM w
),
-- u = first 15 md5 hex digits as BIGINT (the Spark operator's 60-bit
-- shingle id, hashed_shingle_ids); the 32-bit minhash base is exactly
-- u // 2^28 (hex positional arithmetic == hashing the first 8 digits)
us AS (
  SELECT doc_id, s, ('0x' || substr(md5(s), 1, 15))::BIGINT AS u FROM sh
),
hs AS (
  SELECT doc_id, s, u, u // 268435456 AS h FROM us
),
sig AS (
  SELECT doc_id,
         min((h * 1000003 + 17) % 4294967311)    AS h0,
         min((h * 1000033 + 1729) % 4294967311)  AS h1,
         min((h * 1000037 + 20011) % 4294967311) AS h2,
         min((h * 1000039 + 21001) % 4294967311) AS h3,
         min((h * 1000081 + 22003) % 4294967311) AS h4,
         min((h * 1000099 + 23003) % 4294967311) AS h5,
         min((h * 1000117 + 24001) % 4294967311) AS h6,
         min((h * 1000121 + 94261) % 4294967311) AS h7
  FROM hs GROUP BY 1
),
bb AS (
  SELECT doc_id, 0 AS band,
         ('0x' || substr(md5(h0::VARCHAR || ',' || h1::VARCHAR), 1, 15))::BIGINT AS bucket FROM sig
  UNION ALL SELECT doc_id, 1, ('0x' || substr(md5(h2::VARCHAR || ',' || h3::VARCHAR), 1, 15))::BIGINT FROM sig
  UNION ALL SELECT doc_id, 2, ('0x' || substr(md5(h4::VARCHAR || ',' || h5::VARCHAR), 1, 15))::BIGINT FROM sig
  UNION ALL SELECT doc_id, 3, ('0x' || substr(md5(h6::VARCHAR || ',' || h7::VARCHAR), 1, 15))::BIGINT FROM sig
),
bbok AS (
  SELECT band, bucket FROM bb GROUP BY 1, 2 HAVING count(*) <= {_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bb a JOIN bb b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  JOIN bbok k ON k.band = a.band AND k.bucket = a.bucket
),
ds AS (SELECT DISTINCT doc_id, u AS s FROM hs),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN ds sa ON sa.doc_id = c.doc_a
  JOIN ds sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY 1, 2
)
"""

_MINHASH_SQL = (
    _MINHASH_CTES
    + """
SELECT doc_a, doc_b, jaccard FROM (
  SELECT c.doc_a, c.doc_b,
         round(COALESCE(i.ni, 0) / (na.n + nb.n - COALESCE(i.ni, 0)), 6) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes na ON na.doc_id = c.doc_a
  JOIN sizes nb ON nb.doc_id = c.doc_b
) WHERE jaccard >= 0.5
"""
)


@register("dedup_minhash_lsh", _MINHASH_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (md5->32-bit int, 8 affine permutations) + LSH banding (4x2)
    -> candidate pairs -> exact-Jaccard verify >= 0.5. Mutated tail-append
    copies are the known positives (J ~= (n-2)/(n+1))."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    # materialize_shingles=False: with the spread scan, recomputing the
    # hashed-shingle relation for its 3 consumers (~0.9 s/pass at sf1.0)
    # is cheaper than serializing it into executor storage (~3.6 s persist
    # write) — measured single-pass 11.1 -> 5.3 s. The operator default
    # stays True (the 12M-doc scaling job keeps the persist/write-to-table
    # shape that wins when the corpus no longer recomputes in seconds).
    return minhash_lsh_pairs(
        with_near_dup_copies(docs), min_jaccard=0.5, materialize_shingles=False
    )


_SIMHASH_SQL = f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' zqx zqy zqz' FROM documents
),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM all_docs),
sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM w
),
wd AS (SELECT DISTINCT doc_id, s FROM sh),
h AS (SELECT doc_id, substr(md5(s), 1, 16) AS hx FROM wd),
bits AS (
  SELECT doc_id, p,
         CASE WHEN ((strpos('0123456789abcdef', substr(hx, p // 4 + 1, 1)) - 1)
                    // ([8,4,2,1])[p % 4 + 1]) % 2 = 1
              THEN 1 ELSE -1 END AS contrib
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS p) ps
),
per_bit AS (
  SELECT doc_id, p, CASE WHEN sum(contrib) > 0 THEN '1' ELSE '0' END AS c
  FROM bits GROUP BY 1, 2
),
sig AS (SELECT doc_id, string_agg(c, '' ORDER BY p) AS simhash FROM per_bit GROUP BY 1),
chunks AS (
  SELECT doc_id, simhash, ch, substr(simhash, ch * 16 + 1, 16) AS val
  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS ch) cs
),
chunkok AS (
  SELECT ch, val FROM chunks GROUP BY 1, 2 HAVING count(*) <= {_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM chunks a JOIN chunks b
    ON a.ch = b.ch AND a.val = b.val AND a.doc_id < b.doc_id
  JOIN chunkok k ON k.ch = a.ch AND k.val = a.val
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b,
         CAST(64 - len(list_filter(generate_series(1, 64),
                                   i -> substr(sa, i, 1) = substr(sb, i, 1))) AS BIGINT)
           AS hamming
  FROM cand
) WHERE hamming <= 12
"""


@register("dedup_simhash", _SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 (md5-bit trick over distinct words, computed in-row) +
    16-bit chunk LSH -> Hamming <= 12 near-dup pairs. The oracle restates
    the signature via the hex-digit/divisor bit formula — equality proves
    the in-row binary-string path computes the identical signature."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    out = simhash_pairs(with_near_dup_copies(docs), max_hamming=12)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))


#: Adversarial fixture: a 200-copy exact-dup cluster of the first doc's text.
#: Every copy shares all shingles -> identical minhash signature -> one
#: mega-bucket per band. The guard must find and skip exactly those buckets.
_SKEW_GUARD_SQL = """
WITH all_docs AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT 2000000 + gs.i, d.text
  FROM (SELECT unnest(generate_series(0, 199)) AS i) gs
  CROSS JOIN (SELECT text FROM documents ORDER BY doc_id LIMIT 1) d
),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM all_docs),
sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM w
),
hs AS (SELECT doc_id, s, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
sig AS (
  SELECT doc_id,
         min((h * 1000003 + 17) % 4294967311)    AS h0,
         min((h * 1000033 + 1729) % 4294967311)  AS h1,
         min((h * 1000037 + 20011) % 4294967311) AS h2,
         min((h * 1000039 + 21001) % 4294967311) AS h3,
         min((h * 1000081 + 22003) % 4294967311) AS h4,
         min((h * 1000099 + 23003) % 4294967311) AS h5,
         min((h * 1000117 + 24001) % 4294967311) AS h6,
         min((h * 1000121 + 94261) % 4294967311) AS h7
  FROM hs GROUP BY 1
),
bb AS (
  SELECT doc_id, 0 AS band,
         ('0x' || substr(md5(h0::VARCHAR || ',' || h1::VARCHAR), 1, 15))::BIGINT AS bucket FROM sig
  UNION ALL SELECT doc_id, 1, ('0x' || substr(md5(h2::VARCHAR || ',' || h3::VARCHAR), 1, 15))::BIGINT FROM sig
  UNION ALL SELECT doc_id, 2, ('0x' || substr(md5(h4::VARCHAR || ',' || h5::VARCHAR), 1, 15))::BIGINT FROM sig
  UNION ALL SELECT doc_id, 3, ('0x' || substr(md5(h6::VARCHAR || ',' || h7::VARCHAR), 1, 15))::BIGINT FROM sig
),
big AS (
  SELECT band, bucket, count(*) AS n FROM bb GROUP BY 1, 2 HAVING count(*) > 50
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(n) AS BIGINT) AS n_members
FROM big GROUP BY 1
"""


@register("dedup_lsh_skew_guard", _SKEW_GUARD_SQL)
def dedup_lsh_skew_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mega-bucket guard's metric surface (no silent caps): inject a
    200-copy exact-dup cluster, then report per band how many LSH buckets
    exceed the pair-expansion cap and how many docs they hold — exactly what
    candidate_pairs(max_bucket_size=...) skips via its broadcast anti-join.
    The oracle recomputes the same signatures/buckets and must agree on the
    skip set."""
    from abs_log_spark.functions.similarity import (
        band_buckets,
        minhash_signature_arr,
        oversized_buckets,
        shingles_col,
    )

    base = read_table(spark, sf_dir, "documents", spread=True).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    seed = base.orderBy("doc_id").limit(1).select("text")
    mega = (
        spark.range(200)
        .select((F.col("id") + 2_000_000).alias("doc_id"))
        .crossJoin(F.broadcast(seed))
    )
    all_docs = base.unionByName(mega.select("doc_id", "text"))
    docs_sh = all_docs.select("doc_id", shingles_col(F.col("text")).alias("sh"))
    bb = band_buckets(minhash_signature_arr(docs_sh))
    return oversized_buckets(bb, 50).groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.sum("n_members").cast("long").alias("n_members"),
    )


_NGRAM_SQL = (
    _MINHASH_CTES
    + """
, myc AS (SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b FROM documents),
-- the standalone verifier operates on RAW shingle strings (exact_jaccard /
-- exploded_shingles), so its oracle does too — unlike the LSH pipeline's
-- hashed ``ds`` above, which mirrors the operator's compact identities
dss AS (SELECT DISTINCT doc_id, s FROM sh),
nsizes AS (SELECT doc_id, count(*) AS n FROM dss GROUP BY 1),
myinter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM myc c
  JOIN dss sa ON sa.doc_id = c.doc_a
  JOIN dss sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       round(COALESCE(i.ni, 0) / (na.n + nb.n - COALESCE(i.ni, 0)), 6) AS jaccard
FROM myc c
LEFT JOIN myinter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN nsizes na ON na.doc_id = c.doc_a
JOIN nsizes nb ON nb.doc_id = c.doc_b
"""
)


@register("dedup_ngram_jaccard", _NGRAM_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard on an explicit candidate set (every
    (doc, mutated-copy) pair): the standalone verifier operator."""
    from abs_log_spark.functions.similarity import exact_jaccard, exploded_shingles

    docs = read_table(spark, sf_dir, "documents", spread=True)
    all_docs = with_near_dup_copies(docs)
    pairs = docs.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1_000_000).alias("doc_b"),
    )
    return exact_jaccard(pairs, exploded_shingles(all_docs))
