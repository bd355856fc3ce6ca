"""Parquet-backed table catalog with an Iceberg-ready interface.

[B] north_rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar and no network (SURVEY.md section 7), so the catalog writes partitioned
parquet directories behind the same call surface. Swapping ``fmt="iceberg"``
(``df.writeTo(ident).using("iceberg")``) is a one-class change; every caller
goes through :class:`Catalog` and never touches paths or formats directly.

Partition layout is the scale story: at 10^12 rows the input is laid out by
``(source, part_bucket)`` (hash-bucketed doc_id) so that (a) resume can prune
whole partitions via the checkpoint anti-join, (b) per-source skew is split
across buckets, and (c) routed writes are append-only per partition with
dynamic partition overwrite giving idempotent re-runs.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Catalog:
    """Minimal table catalog: name -> partitioned parquet dir under ``root``."""

    root: str
    fmt: str = "parquet"
    _known: set = field(default_factory=set)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        """True only if the table has data files (an empty partitioned write
        leaves just _SUCCESS — treated as non-existent so readers never hit
        schema-inference failures on data-less directories)."""
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.startswith("part-") or "=" in f for f in os.listdir(p)
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def write(
        self,
        df: DataFrame,
        table: str,
        partition_by: tuple[str, ...] = (),
        mode: str = "overwrite",
    ) -> None:
        """Write a table. With ``mode='overwrite'`` + partition columns and the
        session's ``partitionOverwriteMode=dynamic``, only the partitions
        present in ``df`` are replaced — the idempotence primitive behind
        checkpoint/resume (a re-run of a partition replaces exactly itself).
        """
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))
        self._known.add(table)

    def append(self, df: DataFrame, table: str, partition_by: tuple[str, ...] = ()) -> None:
        self.write(df, table, partition_by, mode="append")

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table), ignore_errors=True)
