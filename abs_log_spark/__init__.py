"""abs-log-spark: a from-scratch PySpark-native log/telemetry analytics engine.

Capabilities modeled on the public project jkklee/abs-log (nginx access-log
parse -> URI abstraction -> per-minute summary), re-expressed Spark-first over
tokenized-sequence tables (doc_id, tokens:array<int32>, n_tok, source) per the
binding spec in /root/repo/BASELINE.json (north_star / north_rule / input_hint).

NOTE on reference citations: /root/reference is EMPTY in this environment
(see SURVEY.md section 0). Docstrings cite BASELINE.json ([B]) and public
knowledge of abs-log's expected upstream files ([PK], e.g. log_analyse.py)
instead of file:line into the reference checkout.
"""

__version__ = "0.1.0"

from abs_log_spark.session import get_spark  # noqa: F401
