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
    return {"format": FORMAT, "fields": fields, "dropped_fields": sorted(dropped)}


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
