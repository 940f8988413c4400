"""Typed field mapping: input schema -> index field types (schema-first).

The reference maps Postgres types to search-store field types per column
(/root/reference/pkg/wal/processor/search/store/search_pg_mapper.go:137-183:
ints -> long, floats -> double, text-likes -> keyword with a .text
subfield, timestamps -> date, pgvector -> knn_vector; unknown types are
dropped per-FIELD, not per-record, search_adapter.go:131-134) and writes
the mapping to the store BEFORE any data (dynamic:strict index creation,
search_store.go:203-229).

Our analog: derive a mapping from the Spark input schema, persist it as
mapping.json next to the manifest BEFORE data segments are written
(schema-first ordering — consumers always see the schema a segment was
built under), and version it with the index format. Text fields are the
ones the inverted index covers; keyword/long/double/date fields live in
the docs side table for metadata filtering (search(filter_df=...)).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, types as T

FORMAT = "pgspark-field-mapping/1"


def field_type(dt: T.DataType) -> str | None:
    """Spark dtype -> index field type (None = dropped per-field, the
    reference's unknown-type policy)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "long"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "double"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.StringType):
        return "keyword"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, (T.FloatType, T.DoubleType)
    ):
        return "knn_vector"
    return None


def mapping_for(df: DataFrame, text_fields: tuple[str, ...] = ("text",)) -> dict:
    """Column -> field spec. ``text_fields`` get type "text" (full-text
    indexed — postings/BM25); other strings are "keyword" (exact-match
    metadata, the reference's keyword-with-.text-subfield default)."""
    fields = {}
    dropped = []
    for f in df.schema.fields:
        ft = field_type(f.dataType)
        if ft is None:
            dropped.append(f.name)
            continue
        if f.name in text_fields and ft == "keyword":
            ft = "text"
        spec = {"type": ft}
        if ft == "knn_vector":
            spec["dims"] = None  # data-dependent; filled by the ANN indexer
        fields[f.name] = spec
    return {
        "format": FORMAT,
        "version": 1,
        "fields": fields,
        "dropped_fields": sorted(dropped),
    }


def diff_mappings(old: dict, new: dict, renames: dict[str, str] | None = None) -> dict:
    """Schema diff between two mappings (the reference computes this per
    DDL event, /root/reference/pkg/wal/wal_schema_diff.go:59-80: columns
    added / removed / renamed-by-id).

    ``renames``: explicit old-name -> new-name pairs (the reference knows
    renames from immutable column IDs in the DDL log; a snapshot-table
    engine must be told). Returns {added, removed, renamed, changed}."""
    renames = renames or {}
    of, nf = old.get("fields", {}), new.get("fields", {})
    aliases = old.get("aliases", {})
    conflicts = old.get("conflicts", {})
    # idempotent against already-applied evolution state: existing aliases,
    # deprecated fields, and recorded conflicts produce no new diff entries
    added = {
        c: s
        for c, s in nf.items()
        if c not in of and c not in renames.values() and c not in aliases
    }
    removed = [
        c
        for c in of
        if c not in nf
        and c not in renames
        and c not in set(aliases.values())
        and not of[c].get("deprecated")
    ]
    renamed = {
        o: n
        for o, n in renames.items()
        if o in of and n in nf and o not in nf and aliases.get(n) != o
    }
    changed = {
        c: (of[c]["type"], nf[c]["type"])
        for c in of
        if c in nf
        and of[c]["type"] != nf[c]["type"]
        and conflicts.get(c) != {"stored": of[c]["type"], "incoming": nf[c]["type"]}
    }
    return {"added": added, "removed": removed, "renamed": renamed, "changed": changed}


def evolve_mapping(
    index_dir: str,
    df: DataFrame,
    text_fields: tuple[str, ...] = ("text",),
    renames: dict[str, str] | None = None,
) -> dict:
    """Apply a new input schema to a live index WITHOUT rewriting segments.

    Reference semantics (search_store.go:302-316): a renamed column becomes
    an ALIAS — the stored field keeps its old name, reads under the new
    name resolve through the alias; added fields extend the mapping;
    removed fields are kept but marked deprecated (segments still carry
    them); a changed TYPE is recorded as a conflict requiring a rebuild of
    that field (the reference drops such writes per-field). Every change
    bumps ``version``. Returns the diff that was applied."""
    old = read_mapping(index_dir)
    if old is None:
        write_mapping(index_dir, mapping_for(df, text_fields))
        return {"added": {}, "removed": [], "renamed": {}, "changed": {}}
    new = mapping_for(df, text_fields)
    diff = diff_mappings(old, new, renames)
    if not any(diff.values()):
        return diff
    merged = json.loads(json.dumps(old))  # deep copy
    merged.setdefault("aliases", {})
    merged.setdefault("conflicts", {})
    for o, n in diff["renamed"].items():
        merged["aliases"][n] = o
    for c, spec in diff["added"].items():
        merged["fields"][c] = spec
    for c in diff["removed"]:
        merged["fields"][c]["deprecated"] = True
    for c, (ot, nt) in diff["changed"].items():
        merged["conflicts"][c] = {"stored": ot, "incoming": nt}
    merged["version"] = int(old.get("version", 1)) + 1
    write_mapping(index_dir, merged)
    return diff


def resolve_field(mapping: dict, name: str) -> str | None:
    """Query-side name resolution through rename aliases (bounded walk)."""
    seen = set()
    while name in mapping.get("aliases", {}) and name not in seen:
        seen.add(name)
        name = mapping["aliases"][name]
    spec = mapping.get("fields", {}).get(name)
    return name if spec is not None and not spec.get("deprecated") else None


def mapping_path(index_dir: str) -> str:
    return os.path.join(index_dir, "mapping.json")


def write_mapping(index_dir: str, mapping: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = mapping_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(mapping, f, indent=1, sort_keys=True)
    os.replace(tmp, mapping_path(index_dir))


def read_mapping(index_dir: str) -> dict | None:
    p = mapping_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
