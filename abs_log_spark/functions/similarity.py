"""Similarity primitives for dedup / near-dup detection at training-data scale.

Design constraint: every hash derives from ``md5`` of strings, so the exact
same algorithm is expressible in ANSI SQL (DuckDB oracle) — no
engine-specific hash functions. MinHash uses md5 once per shingle to get a
32-bit int, then K affine permutations ``(a*h + b) % p`` (exact in BIGINT in
any engine); min over a doc's shingle multiset is the signature.

Scale notes (100 TB corpus):
- signatures are computed inside the row (array_min over transform) — no
  shingle explode, no shuffle; the only shuffles are the band-bucket groupBy
  and the candidate-pair joins, all on bounded-size rows (raw text never
  moves).
- LSH banding turns all-pairs O(N^2) into per-bucket pair expansion; bucket
  sizes are bounded by collision probability, and a hot bucket (boilerplate
  dup cluster) is exactly the AQE skew case — run exact dedup first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MINHASH_SEEDS = 8
BAND_SIZE = 2  # 4 bands of 2 -> candidate if any band matches
SIMHASH_BITS = 64
SIMHASH_CHUNK_BITS = 16  # 4 chunks of 16 -> 65536 buckets per chunk position
#: packed-lane capacity: each 16-bit lane holds 2*count, so counts are safe
#: up to 2^15 - 1 distinct features per doc; enforced in simhash_signature.
SIMHASH_MAX_FEATURES = 32767
HEX_DIGITS = "0123456789abcdef"


def words_col(text: Column) -> Column:
    return F.split(text, " ")


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles as an array<string> (space-joined).

    Guarded: docs with < k words yield an empty array (Spark ``sequence``
    descends when start > stop, unlike SQL generate_series).

    The word array is BOUND ONCE per row via a 1-element transform:
    higher-order-function lambdas are interpreted with no common-
    subexpression elimination, so a bare ``split(text)`` referenced inside
    the per-shingle lambda would re-split the full text k times per shingle
    (measured: the re-split was ~1/3 of the whole dedup suite's cost).
    """

    def make(ws: Column) -> Column:
        n = F.size(ws)
        sh = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(k)]),
        )
        return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(words_col(text)), make), 1)


def exploded_shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    return df.select("doc_id", F.explode(shingles_col(F.col(text_col), k)).alias("s"))


#: 2^28 — the place value of md5 hex digit 9 when the first 15 digits are
#: read as one base-16 number: ``u = conv(md5[1:15]) = g * 2^28 + low``,
#: where ``g = conv(md5[1:8])`` is the classic 32-bit MinHash base hash.
#: So ``shiftright(u, 28)`` recovers ``g`` EXACTLY — one conv per shingle
#: serves both the signature path and the verify identity.
_U_TO_G_SHIFT = 28


def hashed_shingle_ids(text: Column, k: int = 3) -> Column:
    """Shingles hashed to ``array<long>`` of 60-bit ids — the compact
    identity that replaces raw shingle strings everywhere downstream of
    the scan. ``u`` = first 15 md5 hex digits as a BIGINT; the MinHash
    base hash is ``shiftright(u, 28)`` (bit-identical to hashing the first
    8 digits directly — hex positional arithmetic), and ``u`` itself is
    the exact-Jaccard verify identity.

    Why: shingle strings are ~40-50 B each; a long is 8 B. The persisted
    shingle relation and the verify join were the dedup job's dominant
    storage/shuffle bytes — at 12M docs the string formulation moves
    multi-GB arrays through the single local disk (a non-core-scaling
    wall the N-vs-4N legs measure directly; on a cluster it's network +
    per-executor disks, still ~5x fewer bytes). And ONE ``conv`` per
    shingle: measured at 2M docs/local[16], a second conv+substring pass
    costs ~45% of the whole hash stage (conv is an interpreted
    string-parse per element; md5 itself is only ~15%).

    Collisions: within a doc-pair's union (what could perturb one Jaccard
    value) ~n^2/2^61 at n shingles — ~4e-13 for n=1000 — and the DuckDB
    oracle computes the IDENTICAL slice, so a collision would be shared
    by both engines, never a parity divergence.
    """
    return F.transform(
        shingles_col(text, k),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )


def band_buckets(sig: DataFrame, seeds: int = MINHASH_SEEDS, band_size: int = BAND_SIZE) -> DataFrame:
    """Signature -> (doc_id, band, bucket) rows; bucket = the first 15 md5
    hex digits of the band's hashes as a 60-bit BIGINT (not the 32-char hex
    string: the bucket relation is persisted AND shuffled — groupBy for the
    cap pre-pass, groupBy for member lists — and an 8-byte key is ~5x
    smaller than the hex string on the wire. 60 bits keep band-local
    collisions at ~|docs|^2/2^61 — negligible, and the oracle slices the
    same 15 digits so any collision is shared, never a divergence).
    Candidate pairs are docs sharing any (band, bucket)."""
    bands = []
    for b in range(seeds // band_size):
        cols = [
            F.col(f"h{b * band_size + j}").cast("string") for j in range(band_size)
        ]
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.conv(F.substring(F.md5(F.concat_ws(",", *cols)), 1, 15), 16, 10)
                .cast("long")
                .alias("bucket"),
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def oversized_buckets(buckets: DataFrame, max_bucket_size: int) -> DataFrame:
    """(band, bucket, n_members) of buckets exceeding the pair-expansion cap.

    The guard's metric surface: callers count/log these so a capped run is
    never a silent truncation. The count aggregate combines map-side, so
    only (band, bucket, partial_count) rows ever shuffle — the doc ids
    don't move for the size check.
    """
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_members"))
        .where(F.col("n_members") > max_bucket_size)
    )


def candidate_pairs(buckets: DataFrame, max_bucket_size: int | None = None) -> DataFrame:
    """Pairs of docs sharing a (band, bucket); dedup'd across bands.

    ONE shuffle of the doc ids: groupBy the bucket key, sorted member list,
    in-row pair expansion (ordered combinations via indexed transform +
    slice). The self-join formulation shuffles the bucket relation twice and
    the pair set a third time for DISTINCT; this moves it once (plus the
    tiny pair dedup).

    A pathological bucket (giant boilerplate dup cluster) is quadratic in
    EITHER formulation — inherent to LSH candidates — and here it also
    builds the pair array in one row. ``max_bucket_size`` is the guard: a
    cheap count pre-pass (map-side combine; see :func:`oversized_buckets`)
    finds oversized buckets, which are removed with a BROADCAST anti-join
    (the oversized set is tiny by definition) before any member list or
    pair is materialized — bounded memory even against a million-doc
    exact-dup cluster. Callers MUST surface ``oversized_buckets`` counts so
    the cap is never silent; running dedup_exact first remains the standard
    curation order that keeps the guard from triggering at all.
    """
    if max_bucket_size is not None:
        bad = oversized_buckets(buckets, max_bucket_size).select("band", "bucket")
        buckets = buckets.join(F.broadcast(bad), ["band", "bucket"], "left_anti")
    grp = (
        buckets.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pairs = grp.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def exact_jaccard(pairs: DataFrame, shingle_rows: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify step after
    LSH recall). Set sizes via distinct; intersection via shingle equi-join
    restricted to the candidate pairs (never all-pairs)."""
    ds = shingle_rows.distinct()
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(ds.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            ds.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.s") == F.col("sb.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"ni": 0})
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")), 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash (md5-hex bit trick: engine-agnostic, SQL-expressible)
# ---------------------------------------------------------------------------


def simhash_signature(
    df: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS, k: int = 3
) -> DataFrame:
    """-> (doc_id, simhash) with simhash a bits-length '0'/'1' string
    (string form keeps the SQL oracle trivially identical).

    Features are word k-gram SHINGLES (like MinHash), not unigrams: on
    short-doc/small-vocabulary corpora unigram SimHash has no separation
    (measured on the sf0.01 fixture: random-pair median hamming 15 vs
    true-near-dup median 8); shingles push random pairs to hamming >= 18
    while true near-dups stay <= 13 — a clean threshold at 12.

    Computed INSIDE the row (mirroring ``minhash_signature_arr``): each
    distinct shingle is md5-hashed once, the first bits/4 hex chars convert
    to a bits-length binary string (MSB-first — identical to the
    hex-digit/divisor formulation the oracle states), and ONE ``aggregate``
    fold sums the per-bit +/-1 contributions into a length-``bits`` counter
    array. Zero explode, zero shuffle: the round-1 formulation exploded
    |features| x bits rows through two groupBy shuffles; at corpus scale
    those rows never need to exist, let alone move.

    Docs with < k words have no shingles and get NO signature row (matching
    the SQL formulation, where they vanish from the shingle relation).
    """
    n_nibbles = bits // 4
    base = df.select(
        "doc_id", F.array_distinct(shingles_col(F.col(text_col), k)).alias("_sh")
    ).where(F.size("_sh") > 0)
    # fail LOUDLY on docs whose distinct-shingle count would overflow a
    # 16-bit lane (same contract as ann._guard_dim: corrupt-silently is the
    # one unacceptable outcome)
    base = base.withColumn(
        "_sh",
        F.when(F.size("_sh") <= SIMHASH_MAX_FEATURES, F.col("_sh")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"simhash: doc exceeds {SIMHASH_MAX_FEATURES} distinct "
                        "shingles (16-bit lane overflow); length-screen it "
                        "upstream. doc_id="
                    ),
                    F.col("doc_id").cast("string"),
                )
            )
        ),
    )
    # PACKED accumulators: one long per md5 hex char, carrying that nibble's
    # 4 bit-counters in 16-bit lanes (lane j = 2*bit(4i+j), doubled so the
    # final sign test is `2*sum(bit) > n_features` with no -1 terms). Each
    # hex char becomes its packed long via an ascii()-INDEXED literal array
    # (element_at(arr, ascii(c) - 47): '0'..'9' land at 1..10, 'a'..'f' at
    # 50..55, gaps zero-filled) — O(1) position lookup, where the previous
    # 16-entry string map scanned up to 16 UTF8String compares per nibble
    # (round-6 measurement: ~20% off the signature stage at sf1.0,
    # bit-identical output). Per feature that's bits/4 array lookups + a
    # bits/4-long zip_with, 4x fewer adds and allocations than per-bit
    # arrays (the original binary-string/char-compare form was 12s at 10k
    # docs). Lane width caps features at 32767 distinct shingles per doc;
    # enforced at runtime below (SIMHASH_MAX_FEATURES) — an over-limit doc
    # would overflow a lane into the adjacent bit's counter and SILENTLY
    # corrupt the signature, so it raises instead (filter/length-screen
    # such docs upstream; a 32k-shingle doc needs screening anyway).
    packed_by_pos = {
        ord(ch) - 47: sum((2 * ((d >> (3 - j)) & 1)) << (16 * j) for j in range(4))
        for d, ch in enumerate(HEX_DIGITS)
    }
    nibble_arr = F.array(
        *[F.lit(packed_by_pos.get(i, 0)).cast("long") for i in range(1, 56)]
    )
    # bind md5(s) ONCE per feature via a 1-element transform (HOF lambdas
    # are interpreted — a bare md5(s) inside the per-nibble lambda would
    # re-evaluate bits/4 times)
    feat_packed = lambda s: F.element_at(  # noqa: E731
        F.transform(
            F.array(F.substring(F.md5(s), 1, n_nibbles)),
            lambda hx: F.transform(
                F.sequence(F.lit(1), F.lit(n_nibbles)),
                lambda i: F.element_at(
                    nibble_arr, F.ascii(F.substring(hx, i, F.lit(1))) - 47
                ),
            ),
        ),
        1,
    )
    acc = F.aggregate(
        F.transform(F.col("_sh"), feat_packed),
        F.array_repeat(F.lit(0).cast("long"), n_nibbles),
        lambda a, b: F.zip_with(a, b, lambda x, y: x + y),
    )
    n = F.size("_sh")
    # unpack ONCE per doc: hex(acc_i) exposes lane j as the 4-hex-digit
    # group at chars (3-j)*4+1..4 (two's complement keeps lanes intact as
    # long as no lane carries); bit = lane_value > n_features
    sig = F.element_at(
        F.transform(
            F.array(acc),
            lambda cc: F.array_join(
                F.flatten(
                    F.transform(
                        cc,
                        lambda one: F.element_at(
                            F.transform(
                                F.array(F.lpad(F.lower(F.hex(one)), 16, "0")),
                                lambda hs: F.transform(
                                    F.sequence(F.lit(0), F.lit(3)),
                                    lambda j: F.when(
                                        F.conv(
                                            F.substring(hs, (3 - j) * 4 + 1, F.lit(4)),
                                            16,
                                            10,
                                        ).cast("long")
                                        > n,
                                        F.lit("1"),
                                    ).otherwise(F.lit("0")),
                                ),
                            ),
                            1,
                        ),
                    )
                ),
                "",
            ),
        ),
        1,
    )
    return base.select("doc_id", sig.alias("simhash"))


def hamming_col(a: Column, b: Column, bits: int = SIMHASH_BITS) -> Column:
    """Hamming distance between two equal-length bit strings: XOR the
    16-bit slices as integers and popcount (4 bit_count ops for 64 bits,
    vs a 64-term chain of per-character compares)."""
    terms = []
    for start in range(0, bits, 16):
        width = min(16, bits - start)
        xa = F.conv(F.substring(a, start + 1, width), 2, 10).cast("long")
        xb = F.conv(F.substring(b, start + 1, width), 2, 10).cast("long")
        terms.append(F.bit_count(xa.bitwiseXOR(xb)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


# ---------------------------------------------------------------------------
# Embedding math (double-cast so DuckDB list_dot_product on ::DOUBLE[] agrees)
# ---------------------------------------------------------------------------


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


# ---------------------------------------------------------------------------
# Array-native MinHash (no explode, no shuffle for signatures)
# ---------------------------------------------------------------------------



#: Affine-permutation constants for integer MinHash: h_i = (A_i*h + B_i) % P.
#: P prime > 2^32; A_i*h < 2^52 so the arithmetic is exact in BIGINT (and in
#: every SQL engine -- the DuckDB oracle states the identical expressions).
MINHASH_P = 4294967311
MINHASH_A = (1000003, 1000033, 1000037, 1000039, 1000081, 1000099, 1000117, 1000121)
MINHASH_B = (17, 1729, 20011, 21001, 22003, 23003, 24001, 94261)


def minhash_signature_arr(
    docs_sh: DataFrame,
    seeds: int = MINHASH_SEEDS,
    sh_col: str = "sh",
    hash_col: str | None = None,
) -> DataFrame:
    """Signatures computed INSIDE the row, zero shuffle and one scan: each
    shingle is md5-hashed ONCE to a 32-bit int (first 8 hex digits), then
    every seed is a cheap affine permutation (A_i*h + B_i) % P over the int
    array -- h_i = array_min of that. vs hashing per (shingle, seed): 8x
    fewer md5 calls, and at 10^12 docs no |doc|x|shingle|xK rows ever move
    through a shuffle (the exploded+groupBy formulation's cost).

    ``hash_col``: name of an ``array<long>`` column already holding the
    32-bit base hashes (the ``g`` field of :func:`hashed_shingles_gv`) —
    used when the caller persists hashed shingles instead of strings, so
    md5 is not recomputed here. Values are identical to the ``sh_col``
    path by construction.
    """
    base = (
        F.col(hash_col)
        if hash_col is not None
        else F.transform(
            F.col(sh_col),
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
        )
    )

    def _perm(i: int):
        # single-arg lambda: a 2-arg lambda would receive (element, index)
        return lambda h: (h * MINHASH_A[i] + MINHASH_B[i]) % MINHASH_P

    with_base = docs_sh.withColumn("_hs", base)
    sig_cols = [
        F.array_min(F.transform(F.col("_hs"), _perm(i))).alias(f"h{i}")
        for i in range(seeds)
    ]
    return with_base.select(*docs_sh.columns, *sig_cols)


def jaccard_from_arrays(
    pairs: DataFrame, docs_sh: DataFrame, sh_col: str = "sh"
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs, via array_intersect on
    the two docs' shingle arrays — only candidate pairs ever move, no
    shingle-row joins."""
    da = docs_sh.select(
        F.col("doc_id").alias("doc_a"), F.array_distinct(F.col(sh_col)).alias("_sa")
    )
    db = docs_sh.select(
        F.col("doc_id").alias("doc_b"), F.array_distinct(F.col(sh_col)).alias("_sb")
    )
    # bind the intersection size once (it appears in numerator AND union
    # denominator; an unbound reference would intersect twice per pair)
    jac = F.element_at(
        F.transform(
            F.array(F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))),
            lambda ni: F.round(ni / (F.size("_sa") + F.size("_sb") - ni), 6),
        ),
        1,
    )
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )
