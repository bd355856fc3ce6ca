"""Text-analysis functions for training-data curation: language ID, quality
scoring, token counting, fingerprinting.

All pure builtin expressions (JVM/codegen — the 100 TB hot path needs no
Python here), each with closed-form SQL twins in the query oracles. The
heuristics are deliberately simple and deterministic; swapping in a real
model (fasttext lang-id, learned quality) would slot into the same column
contract via a pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Tiny per-language stopword lists for the n-gram/stopword lang-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol
#: (kept RE2/Java-regex compatible for oracle parity).
TOKEN_REGEX = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def lang_scores(text: Column) -> dict[str, Column]:
    ws = F.split(text, " ")
    return {
        lang: F.size(
            F.filter(ws, lambda w: w.isin(*stop))
        )
        for lang, stop in LANG_STOPWORDS.items()
    }


def lang_id_col(text: Column) -> Column:
    """Predicted language: max stopword hits, ties broken by language code
    ascending; all-zero -> 'unknown'. Deterministic by construction."""
    scores = lang_scores(text)
    best_lang = F.lit("unknown")
    best_score = F.lit(0)
    for lang in sorted(scores, reverse=True):  # reverse: earlier lang wins ties
        s = scores[lang]
        best_lang = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return best_lang


def n_words_col(text: Column) -> Column:
    return F.size(F.split(text, " "))


def token_count_col(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def quality_score_col(text: Column) -> Column:
    """Composite quality score in [0,1]-ish: length, mean word length,
    alpha ratio. round(,6) for cross-engine determinism."""
    n_chars = F.length(text)
    n_words = n_words_col(text)
    mean_wlen = (n_chars - (n_words - 1)) / n_words  # chars excluding spaces
    alpha = F.length(F.regexp_replace(text, "[^a-z]", ""))
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1))
    len_score = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    wlen_score = F.least(mean_wlen / F.lit(8.0), F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.3 * wlen_score + 0.3 * alpha_ratio, 6
    )


def fingerprint_md5_col(text: Column) -> Column:
    """Stable content fingerprint (exact-dedup key)."""
    return F.md5(text)


ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 31


def rolling_hash_col(text: Column) -> Column:
    """Polynomial rolling hash over the code points: fold (acc*31 + cp) mod p.

    Builtin ``aggregate`` over the char array — the oracle twin is DuckDB
    ``list_reduce(list_prepend(0, codes), ...)`` (same fold, same init)."""
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c) % ROLLING_MOD,
    )
