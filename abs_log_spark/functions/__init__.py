"""Column-level function surface: parse, abstraction, tokens, text, similarity.

Every Python UDF here is a vectorized pandas/Arrow UDF ([B] input_hint: "no
per-row Python") and — wherever the semantics allow — has a builtin-expression
twin used for DuckDB-oracle parity and to keep hot paths inside WholeStage
codegen (SURVEY.md section 4.3 "dual-path design").
"""
