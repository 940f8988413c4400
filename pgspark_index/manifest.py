"""Checkpoint/lineage manifest — the engine's resumability ledger.

Semantics lifted from pgstream's snapshot request store + recorder
(/root/reference/pkg/snapshot/store/postgres/pg_snapshot_store.go:109-171,
/root/reference/pkg/snapshot/generator/snapshot_generator_recorder.go:241-379):
work units are recorded with status requested/in progress/completed plus
errors; on restart, completed units are subtracted from the todo set and
failed units are retried. Commit ordering mirrors checkpoint-after-send
(/root/reference/pkg/wal/processor/search/search_batch_indexer.go:218-223):
the segment + docs parquet for a unit are fully written BEFORE the
manifest row is committed, so a crash can never record uncommitted work.

Storage: one small parquet file per unit under <index>/manifest/ written
atomically (tmp + rename) by the driver — single-writer, idempotent
(rebuilding a unit overwrites the same file). At cluster scale this would
be an Iceberg append; a file-per-unit directory keeps the same semantics
without requiring a catalog in this sandbox.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

STATUS_REQUESTED = "requested"
STATUS_IN_PROGRESS = "in progress"
STATUS_COMPLETED = "completed"  # statuses from /root/reference/pkg/snapshot/snapshot.go:30-34
# failure ledger: a unit that errored is recorded with its message and
# RETRIED on the next resume (completed_units never returns it) — the
# recorder's re-add-failed-tables semantics
# (/root/reference/pkg/snapshot/generator/snapshot_generator_recorder.go:241-379).
STATUS_FAILED = "failed"

FORMAT_VERSION = 3  # v3: dense doc ordinals + doclen sidecar (no per-posting dl)

_FIELDS = {
    "segment_id": pa.string(),
    "unit": pa.int32(),
    "ord_partitions": pa.int32(),  # doc-ordinal partition count (v3 layout)
    "input_snapshot_id": pa.int64(),
    "row_count": pa.int64(),       # docs in the unit
    "sum_doclen": pa.int64(),      # total tokens (for global avgdl)
    "term_count": pa.int64(),      # distinct (term, salt) rows
    "bytes": pa.int64(),           # compressed postings bytes
    "dropped_terms": pa.int64(),   # oversize-guard dropped postings
    "quarantined_docs": pa.int64(),  # per-doc poison drops (failed-docs sidecar)
    "format_version": pa.int32(),
    "status": pa.string(),
    "error": pa.string(),
    "started_at": pa.timestamp("us"),
    "finished_at": pa.timestamp("us"),
}
SCHEMA = pa.schema(list(_FIELDS.items()))


def _dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def commit_unit(index_dir: str, row: dict) -> None:
    """Atomically (tmp+rename) write the unit's manifest row. Idempotent:
    re-running a unit overwrites the same file."""
    d = _dir(index_dir)
    os.makedirs(d, exist_ok=True)
    defaults = {
        "error": None,
        "dropped_terms": 0,
        "quarantined_docs": 0,
        "format_version": FORMAT_VERSION,
        "started_at": dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
        "finished_at": dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
    }
    full = {**defaults, **row}
    table = pa.Table.from_pylist([{k: full.get(k) for k in _FIELDS}], schema=SCHEMA)
    final = os.path.join(d, f"unit-{row['unit']}.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)


def read_manifest(index_dir: str) -> pd.DataFrame:
    """All manifest rows as pandas (empty frame with schema if none)."""
    files = sorted(glob.glob(os.path.join(_dir(index_dir), "unit-*.parquet")))
    if not files:
        return SCHEMA.empty_table().to_pandas()
    # promote unifies manifests written by older format versions
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    ).to_pandas()


def completed_units(index_dir: str, input_snapshot_id: int | None = None) -> set[int]:
    """Units already committed — the resume anti-join's right side.

    If ``input_snapshot_id`` is given, only rows for that input snapshot
    count (a changed input invalidates old work), mirroring the recorder's
    per-request scoping."""
    m = read_manifest(index_dir)
    m = m[m["status"] == STATUS_COMPLETED]
    if input_snapshot_id is not None:
        m = m[m["input_snapshot_id"] == input_snapshot_id]
    return set(int(u) for u in m["unit"])


def global_stats(index_dir: str) -> dict:
    """Corpus stats from committed lineage: N docs, avgdl, totals."""
    m = read_manifest(index_dir)
    m = m[m["status"] == STATUS_COMPLETED]
    n = int(m["row_count"].sum())
    total_dl = int(m["sum_doclen"].sum())
    return {
        "n_docs": n,
        "sum_doclen": total_dl,
        "avgdl": (total_dl / n) if n else 0.0,
        "units": sorted(int(u) for u in m["unit"]),
        "postings_bytes": int(m["bytes"].sum()),
        "term_rows": int(m["term_count"].sum()),
        "dropped_terms": int(m["dropped_terms"].fillna(0).sum()) if "dropped_terms" in m else 0,
        "format_version": FORMAT_VERSION,
    }
