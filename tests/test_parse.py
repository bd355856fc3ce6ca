"""Parse stage: fixture lines incl. malformed; Arrow path == builtin path."""

from __future__ import annotations

from pyspark.sql import functions as F

from abs_log_spark.functions.parse import PARSED_FIELDS, parse_arrow, parse_expr
from abs_log_spark.functions.tokens import detokenize_udf, tokenize_col, tokenize_udf
from abs_log_spark.sources.synth import gen_sequences

GOOD = '10.0.0.1 - [01/Jan/2024:00:05:07 +0000] "GET /api/user/123/profile?q=alpha&page=2 HTTP/1.1" 200 1234 0.042'
GOOD_NO_ARGS = '10.0.0.2 - [01/Jan/2024:01:59:59 +0000] "POST /search HTTP/1.1" 404 99 1.500'
BAD = "not an access log line"


def _tok_df(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    return df.select(tokenize_col(F.col("line")).alias("tokens"))


def test_parse_arrow_fields(spark):
    out = parse_arrow(_tok_df(spark, [GOOD, GOOD_NO_ARGS, BAD])).collect()
    g, g2, b = out
    assert g.valid and g.ip == "10.0.0.1" and g.method == "GET"
    assert g.uri == "/api/user/123/profile" and g.args == "q=alpha&page=2"
    assert g.status == 200 and g.bytes == 1234 and abs(g.rt - 0.042) < 1e-12
    assert str(g.ts) == "2024-01-01 00:05:07"
    assert g2.valid and g2.args == "" and g2.status == 404 and g2.method == "POST"
    assert not b.valid and b.uri is None and b.status is None and b.ts is None


def test_parse_paths_agree(spark):
    """Arrow-UDF path == builtin-expr path on synthetic data w/ corrupt rows."""
    seq = gen_sequences(spark, 500, invalid_every=7)
    a = parse_arrow(seq).select("doc_id", *PARSED_FIELDS)
    e = parse_expr(seq).select("doc_id", *PARSED_FIELDS)
    diff = a.exceptAll(e).count() + e.exceptAll(a).count()
    assert diff == 0
    assert a.where(~F.col("valid")).count() == 500 // 7 + (1 if 500 % 7 >= 7 else 0)


def test_arrow_abstraction_matches_builtin(spark):
    """uri_abs/args_abs emitted inside the Arrow parse UDF == builtin
    transform()-based expressions (three-way dual-path parity)."""
    from abs_log_spark.functions.abstract import args_abs_col, uri_abs_col

    seq = gen_sequences(spark, 400, invalid_every=9)
    a = parse_arrow(seq)
    mism = a.where(
        ~F.col("uri_abs").eqNullSafe(uri_abs_col(F.col("uri")))
        | ~F.col("args_abs").eqNullSafe(args_abs_col(F.col("args")))
    ).count()
    assert mism == 0


def test_arrow_pandas_paths_agree(spark):
    """Pure-Arrow UDF path == pandas-UDF fallback path, including the
    batches the Arrow fast path must hand off: null tokens and non-ASCII
    code points (both detokenize via the per-row fallback)."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    from abs_log_spark.functions.parse import parse_arrow_pandas

    seq = gen_sequences(spark, 300, invalid_every=11)
    # append adversarial rows: null tokens + a non-ASCII (fallback) line
    extra = spark.createDataFrame(
        [(None,), ([ord(c) for c in GOOD.replace("alpha", "ålpha")],)],
        StructType([StructField("tokens", ArrayType(IntegerType()))]),
    )
    base = seq.select("tokens").unionByName(extra)
    a = parse_arrow(base).drop("tokens")
    p = parse_arrow_pandas(base).drop("tokens")
    assert a.exceptAll(p).count() + p.exceptAll(a).count() == 0
    # the non-ASCII line still parses (fallback path is full-Unicode)
    assert a.where(F.col("args") == "q=ålpha&page=2").count() == 1


def test_tokens_untouched_roundtrip(spark):
    """Token-equality invariant [B]: tokens survive the parse byte-identical,
    and detokenize(tokenize(x)) == x for unicode."""
    seq = gen_sequences(spark, 100)
    out = parse_arrow(seq)
    joined = out.alias("o").join(seq.alias("s"), "doc_id").where(
        F.col("o.tokens") != F.col("s.tokens")
    )
    assert joined.count() == 0
    texts = ["hello", "naïve café 中文 😀", ""]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rt = df.select(detokenize_udf(tokenize_udf(F.col("t"))).alias("rt"), "t")
    assert rt.where(F.col("rt") != F.col("t")).count() == 0
