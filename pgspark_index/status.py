"""Index status/health surface — the reference's status & health commands.

pgstream ships ``pgstream status`` / health checks that print one view of
component state: replication slot health, lag, table mode
(/root/reference/cmd/status.go, /root/reference/pkg/stream/stream_status.go;
replication lag from pg_replication_handler.go:260-271 GetReplicationLag).
The batch-engine analog reads everything from the index's own metadata —
manifest lineage, tombstone files, quarantine sidecar, fold journals,
stats.json — with NO Spark session and no data scan:

- units: per-status counts + per-unit rows (id, snapshot, docs, bytes)
- tombstone debt since the last compact (pending superseded versions)
- quarantined poison docs awaiting retry_quarantined
- indexing lag: latest committed input snapshot vs the caller-supplied
  latest AVAILABLE snapshot (the GetReplicationLag analog — the engine
  cannot know upstream's head on its own, exactly like a replica)
- pending fold journals (interrupted merge_units runs)

``index_status`` serves one index dir; a multi-field root (field=<name>/
layout) reports per-field statuses plus shared quarantine state.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq

from . import manifest


def _parquet_rows(files: list[str]) -> int:
    n = 0
    for f in files:
        try:
            n += pq.ParquetFile(f).metadata.num_rows
        except Exception:  # noqa: BLE001 — unreadable file counts as 0
            continue
    return n


def index_status(index_dir: str, latest_snapshot: int | None = None) -> dict:
    m = manifest.read_manifest(index_dir)
    by_status = {s: int(c) for s, c in m["status"].value_counts().items()}
    done = m[m["status"] == manifest.STATUS_COMPLETED]
    units = [
        {
            "unit": int(r["unit"]),
            "snapshot": int(r["input_snapshot_id"]),
            "docs": int(r["row_count"]),
            "terms": int(r["term_count"]),
            "bytes": int(r["bytes"]),
            "quarantined": int(r["quarantined_docs"] or 0),
        }
        for _, r in done.sort_values("unit").iterrows()
    ]
    failed = [
        {"unit": int(r["unit"]), "error": (r["error"] or "")[:200]}
        for _, r in m[m["status"] == manifest.STATUS_FAILED].iterrows()
    ]
    tomb_files = sorted(
        glob.glob(os.path.join(index_dir, "tombstones", "snapshot-*", "*.parquet"))
        + glob.glob(os.path.join(index_dir, "tombstones", "*.parquet"))
    )
    q_files = sorted(
        glob.glob(os.path.join(index_dir, "quarantine", "**", "*.parquet"),
                  recursive=True)
    )
    max_snap = int(done["input_snapshot_id"].max()) if len(done) else None
    stats = None
    sp = os.path.join(index_dir, "stats.json")
    if os.path.exists(sp):
        with open(sp) as f:
            stats = json.load(f)
    out = {
        "index_dir": index_dir,
        "format_version": manifest.FORMAT_VERSION,
        "units_by_status": by_status,
        "n_units": len(units),
        "units": units,
        "failed_units": failed,
        "docs": int(done["row_count"].sum()) if len(done) else 0,
        "postings_bytes": int(done["bytes"].sum()) if len(done) else 0,
        "dropped_terms": int(done["dropped_terms"].fillna(0).sum()) if len(done) else 0,
        # tombstone debt: superseded doc versions awaiting compact
        "tombstone_debt": _parquet_rows(tomb_files),
        # poison docs awaiting retry_quarantined (attempt-log rows)
        "quarantined_docs": _parquet_rows(q_files),
        "pending_folds": [j for _, j in manifest.fold_journals(index_dir)],
        "indexed_snapshot": max_snap,
        "stats": stats,
    }
    if latest_snapshot is not None:
        out["latest_snapshot"] = int(latest_snapshot)
        out["snapshot_lag"] = (
            int(latest_snapshot) - max_snap if max_snap is not None
            else int(latest_snapshot)
        )
    return out


def root_status(index_root: str, latest_snapshot: int | None = None) -> dict:
    """Status of a multi-field root (field=<name>/ dirs) or, if no field
    dirs exist, of the single index at ``index_root``."""
    fdirs = sorted(glob.glob(os.path.join(index_root, "field=*")))
    if not fdirs:
        return index_status(index_root, latest_snapshot)
    fields = {
        os.path.basename(d).split("=", 1)[1]: index_status(d, latest_snapshot)
        for d in fdirs
        if os.path.isdir(d)
    }
    q_files = sorted(
        glob.glob(os.path.join(index_root, "quarantine", "**", "*.parquet"),
                  recursive=True)
    )
    return {
        "index_root": index_root,
        "fields": fields,
        "quarantined_docs": _parquet_rows(q_files),
    }
