"""Shared Spark fixture: one session for the whole test run (local mode)."""

from __future__ import annotations

import pytest

from abs_log_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="abs-log-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_catalog(tmp_path):
    from abs_log_spark.catalog import Catalog

    return Catalog(root=str(tmp_path / "warehouse"))


SF_DIR = "/root/testdata/sf0.001"
