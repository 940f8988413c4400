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
# a unit whose postings/docs were folded into a merged unit by
# incremental.merge_units — hidden from every reader via the fold journal
# (see read_manifest); physically removed by fold cleanup/recovery.
STATUS_FOLDED = "folded"

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
    """All manifest rows as pandas (empty frame with schema if none).

    Fold journals are applied AT READ TIME: a journal written by
    ``incremental.merge_units`` whose folded unit's row is COMPLETED hides
    the source units' rows, so the many-files manifest retirement is
    atomic to every reader the instant the single folded row commits —
    the alias-style cutover of the tiered unit merge. A journal whose new
    unit never committed (crash mid-fold) is inert: the source rows stand
    and fold recovery rolls the staged data back."""
    files = sorted(glob.glob(os.path.join(_dir(index_dir), "unit-*.parquet")))
    if not files:
        return SCHEMA.empty_table().to_pandas()
    # promote unifies manifests written by older format versions
    m = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    ).to_pandas()
    hidden: set[int] = set()
    for _, j in fold_journals(index_dir):
        new_rows = m[(m["unit"] == j["new"]) & (m["status"] == STATUS_COMPLETED)]
        if len(new_rows):
            hidden.update(int(u) for u in j["old"])
    if hidden:
        m = m[~m["unit"].isin(hidden)].reset_index(drop=True)
    return m


# ---- fold journals (tiered unit merge, incremental.merge_units) ----------


def _fold_journal_path(index_dir: str, new_unit: int) -> str:
    return os.path.join(_dir(index_dir), f"fold-{int(new_unit)}.json")


def write_fold_journal(index_dir: str, new_unit: int, old_units: list[int]) -> None:
    """Commit intent of a unit fold (atomic tmp+rename). Written BEFORE the
    folded unit's manifest row: once that row lands, read_manifest hides
    the old rows in the same read — no multi-file-delete race."""
    import json

    d = _dir(index_dir)
    os.makedirs(d, exist_ok=True)
    final = _fold_journal_path(index_dir, new_unit)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"new": int(new_unit), "old": [int(u) for u in old_units]}, f)
    os.replace(tmp, final)


def fold_journals(index_dir: str) -> list[tuple[str, dict]]:
    """[(path, {"new": unit, "old": [units]})] of pending fold journals."""
    import json

    out = []
    for p in sorted(glob.glob(os.path.join(_dir(index_dir), "fold-*.json"))):
        try:
            with open(p) as f:
                out.append((p, json.load(f)))
        except (OSError, ValueError):  # torn tmp never renamed in — skip
            continue
    return out


def clear_fold_journal(index_dir: str, new_unit: int) -> None:
    try:
        os.remove(_fold_journal_path(index_dir, new_unit))
    except FileNotFoundError:
        pass


def delete_unit_row(index_dir: str, unit: int) -> None:
    """Physically retire one unit's manifest file (fold cleanup)."""
    try:
        os.remove(os.path.join(_dir(index_dir), f"unit-{int(unit)}.parquet"))
    except FileNotFoundError:
        pass


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
