"""Text-analysis queries: language ID, quality scoring, token counting,
fingerprinting — the curation surface a training-data pipeline needs over
the ``documents`` table. All builtin-expression (JVM) with exact SQL twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from abs_log_spark.functions.text import (
    LANG_STOPWORDS,
    TOKEN_REGEX,
    fingerprint_md5_col,
    lang_id_col,
    n_words_col,
    quality_score_col,
    rolling_hash_col,
    token_count_col,
)
from abs_log_spark.queries import register
from abs_log_spark.sources.readers import read_table


def _stop_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(text,' '), w -> list_contains([{lst}], w)))"
    )


_LANG_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_stop_sql('de')} AS s_de, {_stop_sql('en')} AS s_en,
         {_stop_sql('es')} AS s_es, {_stop_sql('fr')} AS s_fr,
         {_stop_sql('zh')} AS s_zh
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'unknown'
       WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
       WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
       WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
       ELSE 'zh' END AS lang_pred
FROM scored
"""


@register("text_lang_id", _LANG_SQL)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (max score, ties -> lang code ascending,
    zero -> unknown)."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id", "lang", lang_id_col(F.col("text")).alias("lang_pred")
    )


_STATS_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS INT) AS n_tokens,
       round(
         0.4 * least(length(text) / 400.0, 1.0)
       + 0.3 * least(((length(text) - (len(string_split(text,' ')) - 1))
                      / len(string_split(text,' '))) / 8.0, 1.0)
       + 0.3 * (length(regexp_replace(text, '[^a-z]', '', 'g'))
                / greatest(length(text), 1)), 6) AS quality
FROM documents
"""


@register("text_stats_quality", _STATS_SQL)
def text_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char/word/BPE-ish token counts + composite quality score."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).cast("int").alias("n_chars"),
        n_words_col(t).cast("int").alias("n_words"),
        token_count_col(t).cast("int").alias("n_tokens"),
        quality_score_col(t).alias("quality"),
    )


_FP_SQL = """
SELECT doc_id,
       md5(text) AS fp_md5,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007) AS fp_rolling
FROM documents
"""


@register("text_fingerprints", _FP_SQL)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 + polynomial rolling hash over code points
    (the builtin ``aggregate`` fold; oracle uses list_reduce — same fold)."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        fingerprint_md5_col(F.col("text")).alias("fp_md5"),
        rolling_hash_col(F.col("text")).alias("fp_rolling"),
    )


_MM_SQL = """
SELECT doc_id,
       'image/fake' AS media_type,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(strlen(text) % 640 + 16 AS INT) AS width,
       CAST((strlen(text) * 7) % 480 + 16 AS INT) AS height,
       CAST(strlen(text) % 10 + 1 AS INT) AS n_frames
FROM documents
"""


@register("multimodal_features", _MM_SQL)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload plumbing: UTF-8 bytes as an opaque media column,
    Arrow-batched mapInPandas feature extraction (decode stubbed — see
    abs_log_spark.multimodal), metadata checked against byte-level SQL."""
    from abs_log_spark.multimodal import attach_payload, extract_features

    # no spread: the mapInPandas stage pays a fixed Python-worker cost per
    # task, and fanning a sub-MB payload table out to more tasks measured
    # WORSE at sf0.1 (0.35 -> 0.6 s warm) for no sf1.0 gain
    docs = read_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


_RESIZE_SQL = """
SELECT doc_id,
       CAST(32 AS INT) AS width,
       CAST(8 AS INT)  AS height,
       CAST(least(length(text), 256) AS BIGINT) AS n_bytes_out,
       md5(substr(text, 1, 256)) AS resized_md5
FROM documents
"""


@register("multimodal_resize", _RESIZE_SQL)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed image resize with real mapInPandas plumbing (binary in,
    binary-derived out); byte-level md5 checked against the oracle."""
    from abs_log_spark.multimodal import attach_payload, resize_images

    # no spread: the mapInPandas stage pays a fixed Python-worker cost per
    # task, and fanning a sub-MB payload table out to more tasks measured
    # WORSE at sf0.1 (0.35 -> 0.6 s warm) for no sf1.0 gain
    docs = read_table(spark, sf_dir, "documents")
    return resize_images(attach_payload(docs), width=32, height=8)


_FRAMES_SQL = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n, length(text) % 10 + 1 AS nf
  FROM documents
), sized AS (
  SELECT doc_id, text, nf, n // nf AS sz FROM d WHERE n // nf > 0
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(sz AS BIGINT) AS frame_bytes,
       md5(substr(text, i * sz + 1, sz)) AS frame_md5
FROM sized, unnest(generate_series(0, nf - 1, 2)) AS t(i)
"""


@register("multimodal_frame_sample", _FRAMES_SQL)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed video frame sampling: 1 payload -> N frame rows (every 2nd of
    the stub's n_frames equal chunks) via mapInPandas; frame bytes md5
    checked against the oracle."""
    from abs_log_spark.multimodal import attach_payload, sample_frames

    # no spread: the mapInPandas stage pays a fixed Python-worker cost per
    # task, and fanning a sub-MB payload table out to more tasks measured
    # WORSE at sf0.1 (0.35 -> 0.6 s warm) for no sf1.0 gain
    docs = read_table(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs), every=2)


_REPETITION_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS s
  FROM w
)
SELECT doc_id,
       CAST(len(s) AS INT) AS n_shingles,
       CAST(len(list_distinct(s)) AS INT) AS n_distinct,
       CASE WHEN len(s) > 0
            THEN round(1.0 - len(list_distinct(s)) / len(s), 6)
            ELSE 0.0 END AS rep_ratio
FROM sh
"""


@register("text_repetition", _REPETITION_SQL)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition / boilerplate scoring: fraction of duplicated word
    3-gram shingles per doc (1 - distinct/total) — the standard
    quality-filter signal for templated or looping text. Entirely IN-ROW
    (array exprs over the shingle array): zero shuffle, zero explode — at
    100 TB this is a pure map over the corpus scan."""
    from abs_log_spark.functions.similarity import shingles_col

    docs = read_table(spark, sf_dir, "documents", spread=True)
    sh = shingles_col(F.col("text"))
    ns = F.size(sh)
    nd = F.size(F.array_distinct(sh))
    return docs.select(
        "doc_id",
        ns.cast("int").alias("n_shingles"),
        nd.cast("int").alias("n_distinct"),
        F.when(ns > 0, F.round(1.0 - nd / ns, 6)).otherwise(F.lit(0.0)).alias("rep_ratio"),
    )


_TFIDF_SQL = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.word, round(t.tf * ln((n.n + 1.0) / (d.df + 1.0)), 6) AS score
  FROM tf t JOIN dfreq d USING (word) CROSS JOIN n
)
SELECT doc_id, word, score, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS INT) AS rank
  FROM scored
) WHERE rank <= 3
"""


def _tfidf_topk(
    spark: SparkSession, sf_dir: str, broadcast_counts: bool | None
) -> DataFrame:
    """``broadcast_counts``: True = broadcast hint (vocab fits executors),
    False = shuffle_hash hint (deterministic open-vocab plan for the driver
    artifact), None = ORGANIC — no hint; the planner picks the join from
    real statistics vs ``autoBroadcastJoinThreshold``. The organic-crossover
    test (tests/test_curation.py) runs this mode under a lowered threshold
    and asserts Spark itself chooses the shuffle join."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents", spread=True)
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    if broadcast_counts:
        dfreq = F.broadcast(dfreq)
    elif broadcast_counts is not None:
        dfreq = dfreq.hint("shuffle_hash")
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("score"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= 3)
        .select("doc_id", "word", "score", "rank")
    )


@register("text_tfidf_topk", _TFIDF_SQL)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF keywords (smoothed idf = ln((N+1)/(df+1)),
    deterministic ties by word) — the keyword-extraction / feature side of
    corpus curation. Scale shape: explode -> (doc, word) tf groupBy is the
    one fact shuffle; the document-frequency relation is VOCABULARY-sized
    and broadcasts back onto tf; top-k plans as WindowGroupLimit (partial
    top-3 per partition before the window shuffle)."""
    return _tfidf_topk(spark, sf_dir, broadcast_counts=True)


@register("text_tfidf_topk_openvocab", _TFIDF_SQL)
def text_tfidf_topk_openvocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPEN-VOCABULARY TF-IDF: identical semantics (same oracle SQL), but
    the document-frequency relation joins via SHUFFLE_HASH instead of a
    broadcast — the plan a real web corpus forces once the vocabulary (with
    its Zipf long tail of hapaxes) no longer fits an executor. Both sides
    shuffle on ``word``; AQE's skew-join split handles the stopword-headed
    hot keys. Plan evidence (no BroadcastHashJoin on the df join) is
    asserted in tests/test_curation.py."""
    return _tfidf_topk(spark, sf_dir, broadcast_counts=False)


_LM_QUALITY_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                               i -> ws[i] || ' ' || ws[i+1])) AS b
  FROM w
),
uni AS (SELECT doc_id, unnest(ws) AS word FROM w),
cbg AS (SELECT b, count(*) AS c FROM bg GROUP BY 1),
cuni AS (SELECT word, count(*) AS c FROM uni GROUP BY 1),
v AS (SELECT count(DISTINCT word) AS v FROM uni),
scored AS (
  SELECT d.doc_id,
         CAST(round(ln((cb.c + 1.0) / (cu.c + v.v)) * 1000000) AS BIGINT) AS lp_q
  FROM bg d
  JOIN cbg cb ON cb.b = d.b
  JOIN cuni cu ON cu.word = string_split(d.b, ' ')[1]
  CROSS JOIN v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(sum(lp_q) / 1000000.0 / count(*), 6) AS avg_logp
FROM scored GROUP BY 1
"""


def _lm_quality(
    spark: SparkSession, sf_dir: str, broadcast_counts: bool | None
) -> DataFrame:
    """``broadcast_counts`` trivalent exactly as in :func:`_tfidf_topk`:
    True = broadcast, False = shuffle_hash hint, None = organic (planner
    decides from statistics; exercised by the crossover test)."""
    from abs_log_spark.functions.similarity import shingles_col

    docs = read_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    bg = docs.select(
        "doc_id", F.explode(shingles_col(F.col("text"), k=2)).alias("b")
    )
    uni = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    cbg = bg.groupBy("b").agg(F.count("*").alias("cb"))
    cuni = uni.groupBy("word").agg(F.count("*").alias("cu"))
    if broadcast_counts:
        cbg, cuni = F.broadcast(cbg), F.broadcast(cuni)
    elif broadcast_counts is not None:
        cbg, cuni = cbg.hint("shuffle_hash"), cuni.hint("shuffle_hash")
    v = uni.agg(F.count_distinct("word").alias("v"))
    scored = (
        bg.join(cbg, "b")
        .join(
            cuni,
            F.element_at(F.split(F.col("b"), " "), 1) == F.col("word"),
        )
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            # cross-engine float parity (CLAUDE.md contract, same discipline
            # as kmeans_ivf_assign): quantize each bigram's log-prob to a
            # 1e-6-grained BIGINT, sum the integers (exact, shuffle-order-
            # free), divide once — F.avg over raw doubles would compare
            # order-dependent float addition against DuckDB's
            F.round(
                F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("v"))) * 1e6
            ).cast("long").alias("lp_q"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum("lp_q") / 1e6 / F.count("*"), 6).alias("avg_logp"),
    )


@register("text_lm_quality", _LM_QUALITY_SQL)
def text_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring (the CCNet/KenLM-style curation
    filter): train corpus-level bigram counts, score each doc by its mean
    add-1-smoothed bigram log-probability ln((c(w1 w2)+1)/(c(w1)+V)).
    Low scores = improbable word sequences (garbled or off-distribution
    text). Scale shape: the bigram/unigram count relations are
    VOCABULARY-sized (map-side combined aggregates) and broadcast back
    onto the exploded doc bigrams — the corpus sees one explode + one
    per-doc combine, never a corpus-to-corpus join. Per-bigram log-probs
    are 1e-6-quantized BIGINTs summed exactly (cross-engine float
    parity)."""
    return _lm_quality(spark, sf_dir, broadcast_counts=True)


@register("text_lm_quality_openvocab", _LM_QUALITY_SQL)
def text_lm_quality_openvocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPEN-VOCABULARY LM scoring: identical semantics (same oracle SQL),
    but the bigram/unigram count relations join via SHUFFLE_HASH — the
    plan a web-scale corpus forces once bigram counts (Zipf tail) exceed
    any broadcast threshold. The corpus-side bigrams shuffle on the join
    key; stopword-headed hot bigrams are exactly the AQE skew-join-split
    case (enabled session-wide). Plan evidence (no BroadcastHashJoin on
    either count join) asserted in tests/test_curation.py."""
    return _lm_quality(spark, sf_dir, broadcast_counts=False)


_CURATION_SQL = """
WITH all_docs AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang FROM documents  -- injected exact dups
),
surv AS (
  SELECT min(doc_id) AS doc_id FROM all_docs GROUP BY md5(text)
),
kept AS (
  SELECT d.* FROM all_docs d JOIN surv USING (doc_id)
),
scored AS (
  SELECT lang,
         round(
           0.4 * least(length(text) / 400.0, 1.0)
         + 0.3 * least(((length(text) - (len(string_split(text,' ')) - 1))
                        / len(string_split(text,' '))) / 8.0, 1.0)
         + 0.3 * (length(regexp_replace(text, '[^a-z]', '', 'g'))
                  / greatest(length(text), 1)), 6) AS q
  FROM kept
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(q), 6) AS avg_quality
FROM scored WHERE q >= 0.5 GROUP BY 1
"""


@register("curation_pipeline", _CURATION_SQL)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composition: inject exact duplicates -> exact
    dedup (md5 hash-groupBy survivors) -> quality filter (>= 0.5) -> per-
    language corpus stats. Demonstrates that the training-data operators
    compose as one declarative plan: dedup agg + survivor semi-join +
    quality expr + final agg, two shuffles total, no intermediate
    materialization."""
    from abs_log_spark.operators.dedup import dedup_exact

    docs = read_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text", "lang")
    all_docs = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang")
    )
    surv = dedup_exact(all_docs).select(F.col("keep_id").alias("doc_id"))
    kept = all_docs.join(surv, "doc_id")
    scored = kept.select("lang", quality_score_col(F.col("text")).alias("q"))
    return (
        scored.where(F.col("q") >= 0.5)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
        )
    )
