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

    def partition_values(self, table: str, key: str = "part_bucket") -> set[str]:
        """Partition values of a table's top-level ``key=value`` dirs, from
        the directory listing alone (the parquet stand-in for an Iceberg
        partitions-metadata query — no Spark job, no file reads)."""
        p = self.path(table)
        if not os.path.isdir(p):
            return set()
        return {
            d.split("=", 1)[1]
            for d in os.listdir(p)
            if d.startswith(f"{key}=") and os.path.isdir(os.path.join(p, d))
        }

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

    def promote_sink_tables(self, staging_table: str, table_prefix: str) -> list[str]:
        """Promote a staging write partitioned by ``_sink`` into per-sink
        tables by moving each ``_sink=S`` directory wholesale to
        ``<prefix>S`` (full-table replace — summary tables are rewritten per
        run). The data files keep their own ``sink`` column; ``_sink`` exists
        only to drive the directory layout, so ONE write job fans out to N
        sink tables. Iceberg equivalent: ``REPLACE TABLE ... AS SELECT``
        per sink, or a single table with sink partition."""
        staging = self.path(staging_table)
        sinks: list[str] = []
        if not os.path.isdir(staging):
            return sinks
        for d in sorted(os.listdir(staging)):
            if not d.startswith("_sink="):
                continue
            sink = d.split("=", 1)[1]
            target = self.path(f"{table_prefix}{sink}")
            shutil.rmtree(target, ignore_errors=True)
            os.replace(os.path.join(staging, d), target)
            self._known.add(f"{table_prefix}{sink}")
            sinks.append(sink)
        shutil.rmtree(staging, ignore_errors=True)
        return sinks

    def promote_partitions(self, staging_table: str, table_prefix: str) -> dict[str, list[str]]:
        """Promote a staging write partitioned by (sink, <key>) into per-sink
        tables by moving partition directories: ``staging/sink=S/<key>=V`` ->
        ``<prefix>S/<key>=V`` (replacing any existing target partition).

        This is the parquet stand-in for Iceberg's atomic partition replace:
        ONE data pass writes every sink's rows; routing to per-sink tables is
        a metadata operation, not a second scan. Returns {sink: [key dirs]}.
        """
        staging = self.path(staging_table)
        moved: dict[str, list[str]] = {}
        if not os.path.isdir(staging):
            return moved
        for sink_dir in sorted(os.listdir(staging)):
            if not sink_dir.startswith("sink="):
                continue
            sink = sink_dir.split("=", 1)[1]
            target_root = self.path(f"{table_prefix}{sink}")
            os.makedirs(target_root, exist_ok=True)
            moved[sink] = []
            src_root = os.path.join(staging, sink_dir)
            for part_dir in sorted(os.listdir(src_root)):
                src = os.path.join(src_root, part_dir)
                if not os.path.isdir(src):
                    continue
                dst = os.path.join(target_root, part_dir)
                shutil.rmtree(dst, ignore_errors=True)
                os.replace(src, dst)
                moved[sink].append(part_dir)
            self._known.add(f"{table_prefix}{sink}")
        shutil.rmtree(staging, ignore_errors=True)
        return moved
