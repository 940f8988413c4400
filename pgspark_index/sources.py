"""Table source adapters: snapshot-pinned and incremental reads.

The north-rule input is an Iceberg table of Common-Crawl-style web pages;
the build consumes (a) a snapshot-consistent full scan — pgstream's
repeatable-read snapshot transaction
(/root/reference/pkg/snapshot/generator/postgres/data/pg_snapshot_generator.go:603-618)
— and (b) incremental reads of rows added between two snapshots — the
replication-slot tail (pkg/wal/listener/postgres/wal_pg_listener.go:91-197,
LSN bookkeeping pg_replication_handler.go:179-349; our snapshot ids are the
LSN analog, recorded per unit in the manifest).

This container ships no Iceberg runtime, so the Iceberg calls sit behind a
runtime probe; a parquet-directory layout with `snapshot=<id>` subdirs
provides the same two read shapes for tests and local runs. On a cluster
with Iceberg on the classpath the exact same engine code runs against real
tables — only this module's read path switches.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def _snapshot_dirs(path: str) -> list[tuple[int, str]]:
    out = []
    for d in glob.glob(os.path.join(path, "snapshot=*")):
        m = re.fullmatch(r"snapshot=(\d+)", os.path.basename(d))
        if m:
            out.append((int(m.group(1)), d))
    return sorted(out)


def read_snapshot(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Snapshot-consistent full read (the bulk-snapshot input).

    Iceberg: `snapshot-id` read option pins the scan to one table snapshot
    (the SET TRANSACTION SNAPSHOT analog). Parquet layout: union of all
    `snapshot=<id>` subdirs with id <= snapshot_id (or every subdir / the
    bare directory when unpartitioned)."""
    if iceberg_available(spark) and not os.path.isdir(table):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(table)
    snaps = _snapshot_dirs(table)
    if not snaps:
        return spark.read.parquet(table)
    dirs = [d for sid, d in snaps if snapshot_id is None or sid <= snapshot_id]
    if not dirs:
        raise ValueError(f"no snapshots <= {snapshot_id} under {table}")
    return spark.read.parquet(*dirs)


def incremental_read(
    spark: SparkSession,
    table: str,
    start_snapshot_id: int,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Rows appended AFTER ``start_snapshot_id`` (exclusive) up to
    ``end_snapshot_id`` (inclusive) — the replication-tail read feeding
    ``incremental.build_delta``. Iceberg: incremental append scan
    (`start-snapshot-id`/`end-snapshot-id`). Parquet layout: the
    `snapshot=<id>` subdirs in that id range."""
    if iceberg_available(spark) and not os.path.isdir(table):
        reader = spark.read.format("iceberg").option(
            "start-snapshot-id", str(start_snapshot_id)
        )
        if end_snapshot_id is not None:
            reader = reader.option("end-snapshot-id", str(end_snapshot_id))
        return reader.load(table)
    snaps = _snapshot_dirs(table)
    dirs = [
        d
        for sid, d in snaps
        if sid > start_snapshot_id
        and (end_snapshot_id is None or sid <= end_snapshot_id)
    ]
    if not dirs:
        return spark.createDataFrame([], read_snapshot(spark, table).schema)
    return spark.read.parquet(*dirs)


def latest_snapshot_id(spark: SparkSession, table: str) -> int | None:
    """Newest snapshot id: Iceberg metadata table query, or the max
    `snapshot=<id>` subdir."""
    if iceberg_available(spark) and not os.path.isdir(table):
        row = spark.sql(
            f"SELECT max(snapshot_id) AS s FROM {table}.snapshots"
        ).collect()[0]
        return int(row["s"]) if row["s"] is not None else None
    snaps = _snapshot_dirs(table)
    return snaps[-1][0] if snaps else None


def write_snapshot(df: DataFrame, table: str, snapshot_id: int) -> None:
    """Parquet-layout helper (tests/local): append one snapshot subdir."""
    df.write.mode("overwrite").parquet(
        os.path.join(table, f"snapshot={snapshot_id}")
    )
