"""bench.py contract: headline names resolve, scaling artifact well-formed.
(No SparkSession — these guard the driver-facing surface cheaply.)"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_headline_queries_are_registered():
    import bench
    from abs_log_spark.queries import load_all

    reg = load_all()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, missing
    # every headline query must be oracle-checked (no rows-only headliners)
    weak = [n for n in bench.HEADLINE if reg[n][1] is None]
    assert not weak, weak


def test_every_query_has_oracle():
    """Round-2 invariant: zero `no_oracle` rows in CORRECTNESS."""
    from abs_log_spark.queries import load_all

    no_oracle = [n for n, (_f, sql) in load_all().items() if sql is None]
    assert no_oracle == [], no_oracle


def test_scaling_artifact_shape():
    import bench

    blob = bench.load_scaling()
    if "note" in blob:  # not yet measured in this checkout
        return
    assert {"rows", "efficiency_n_to_4n", "measured_at_commit"} <= blob.keys()
    assert 0 < blob["efficiency_n_to_4n"] <= 1.0
    assert isinstance(blob["stale"], bool)
    # round-5 protocol: every leg carries its admission control(s), and the
    # dedup leg's pair count is identical at both parallelism levels
    assert "cpu_control" in blob
    leg = blob.get("dedup_leg")
    if leg is not None:
        assert leg["local4"]["n_pairs"] == leg["local16"]["n_pairs"]
        assert "cpu_control" in leg
    # artifact parses as the checked-in json too
    with open(bench.SCALING_FILE) as f:
        json.load(f)
