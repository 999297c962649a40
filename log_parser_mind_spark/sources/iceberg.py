"""Iceberg backend for the snapshot store (SURVEY §2.1 S4-S7) behind the
``iceberg_available()`` gate.

The north rule targets a 10^12-turn Iceberg transcripts table; the sandbox
ships no Iceberg jar (SURVEY §7.2), so day-to-day the parquet+manifest
emulation (manifest.SnapshotStore) carries the commit/resume semantics. This
module is the REAL path the gate selects when a catalog is configured:

  - commit       → ``df.writeTo(ns.sink).append()`` — one atomic Iceberg
                   snapshot per stage, lineage from the snapshot's summary
                   metrics (added-records), no footer walk needed.
  - read         → ``spark.read.table`` (latest) / time-travel by snapshot-id.
  - template upsert (S7 ReplacingMergeTree) → ``MERGE INTO`` on template_id.
  - TTL expire   → partition-predicate ``DELETE`` on the month partition —
                   Iceberg drops whole data files by metadata when the
                   predicate aligns with partitioning, the same no-rewrite
                   behavior SnapshotStore.expire implements by deleting
                   month= dirs.

Without the jar these calls fail at analysis time; the unit tests exercise
the backend DISPATCH (gate mocked both ways) and the generated SQL shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import iceberg_available


def merge_upsert_sql(table: str, source: str, key_cols: list[str], update_cols: list[str]) -> str:
    """S7 — the template-upsert MERGE the reference gets from
    ReplacingMergeTree (001_clickhouse_schema.sql:33): latest row per key
    wins, new keys insert."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    return (
        f"MERGE INTO {table} t USING {source} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT *"
    )


def expire_months_sql(table: str, cutoff_month: str, month_col: str = "month") -> str:
    """TTL as a partition-predicate DELETE: aligned with the month partition
    spec, Iceberg executes this as metadata-only data-file drops (the
    001_clickhouse_schema.sql:20-22 toYYYYMM + TTL behavior)."""
    return f"DELETE FROM {table} WHERE {month_col} < '{cutoff_month}'"


def expire_ts_sql(table: str, ts_col: str, older_than: str) -> str:
    """TTL as a timestamp-predicate DELETE — works on ANY sink regardless of
    partitioning (SnapshotStore.expire's fallback parity): Iceberg still
    drops whole data files by metadata where the predicate aligns with a
    month(ts) partition transform, and rewrites only the boundary files
    otherwise."""
    return f"DELETE FROM {table} WHERE {ts_col} < TIMESTAMP '{older_than}'"


class IcebergStore:
    """Same commit/read/expire surface as manifest.SnapshotStore, over a real
    Iceberg catalog namespace instead of snapshot= directories."""

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.namespace = namespace

    def _table(self, sink: str) -> str:
        return f"{self.namespace}.{sink}"

    def commit(
        self,
        df: DataFrame,
        sink: str,
        run_id: str,
        snapshot: int | None = None,
        sort_within_partitions: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        from pyspark.sql import functions as F

        out = df
        if sort_within_partitions:
            out = out.sortWithinPartitions(*sort_within_partitions)
        t = self._table(sink)
        writer = out.writeTo(t).tableProperty("write.metadata.metrics.default", "truncate(16)")
        if not self.spark.catalog.tableExists(t):
            if partition_by:
                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.create()
        else:
            writer.append()
        return self.latest_snapshot(sink)

    def latest_snapshot(self, sink: str) -> int | None:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._table(sink)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return rows[0][0] if rows else None

    def read(self, sink: str, snapshot: int | None = None) -> DataFrame:
        if snapshot is None:
            return self.spark.read.table(self._table(sink))
        return self.spark.read.option("snapshot-id", snapshot).table(self._table(sink))

    def upsert_templates(self, templates: DataFrame, sink: str = "templates") -> None:
        view = f"_upsert_{sink}"
        templates.createOrReplaceTempView(view)
        cols = [c for c in templates.columns if c != "template_id"]
        self.spark.sql(merge_upsert_sql(self._table(sink), view, ["template_id"], cols))

    def expire(self, sink: str, ts_col: str, older_than: str) -> None:
        # Predicate on the CALLER'S ts column, not a hardcoded month column
        # only parsed_turns has — any sink expires correctly, matching
        # SnapshotStore.expire's unpartitioned fallback behavior.
        self.spark.sql(expire_ts_sql(self._table(sink), ts_col, older_than))


def snapshot_store(spark: SparkSession, root: str, namespace: str | None = None):
    """Backend dispatch: a configured namespace AND a present Iceberg runtime
    select the real catalog path; otherwise the parquet+manifest emulation
    (which carries identical commit/resume semantics in-sandbox)."""
    from .manifest import SnapshotStore

    if namespace is not None and iceberg_available(spark):
        return IcebergStore(spark, namespace)
    return SnapshotStore(spark, root)
