"""Merge pass: union per-unit segment directories into a global lexicon.

pgstream analog: the search store's index/mapping bookkeeping — one
authoritative view over per-batch writes, updated after data lands
(/root/reference/pkg/wal/processor/search/store/search_store.go:272-321);
column renames become aliases rather than rewrites, and likewise our merge
never rewrites postings — the lexicon is pure indirection
(term -> [(unit, salt, df)]) plus global df totals for IDF.

The merge is a single groupBy(term) over the (small) segment *directory*
rows — postings blobs are carried by reference in the same row here
because Parquet stores them column-separately; the lexicon parquet is
written WITHOUT the postings column, so its scan stays tiny. Global doc
stats (N, avgdl) come from manifest lineage, not a data pass.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import manifest
from .build import segments_path

LEXICON_COLS = ["term", "df_total", "cf_total", "entries"]


def lexicon_path(index_dir: str) -> str:
    return os.path.join(index_dir, "lexicon")


def stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats.json")


def merge_index(spark: SparkSession, index_dir: str, lexicon_partitions: int | None = None) -> dict:
    """Build lexicon parquet + stats.json from committed segments.

    One shuffle on term; output range-partitioned and sorted by term so
    query-time term lookups hit few row groups (parquet min/max pruning)."""
    seg = spark.read.parquet(segments_path(index_dir)).select(
        "term", "unit", "salt", "part_id", "df", "cf"
    )
    parts = lexicon_partitions or max(
        1, int(spark.conf.get("spark.sql.shuffle.partitions")) // 2
    )
    lex = (
        seg.groupBy("term")
        .agg(
            F.sum("df").alias("df_total"),
            F.sum("cf").alias("cf_total"),
            F.collect_list(F.struct("unit", "salt", "part_id", "df")).alias("entries"),
        )
        .repartitionByRange(parts, "term")
        .sortWithinPartitions("term")
    )
    lex.write.mode("overwrite").parquet(lexicon_path(index_dir))

    stats = manifest.global_stats(index_dir)
    with open(stats_path(index_dir), "w") as f:
        json.dump(stats, f)
    return stats


def load_stats(index_dir: str) -> dict:
    with open(stats_path(index_dir)) as f:
        return json.load(f)


def read_lexicon(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(lexicon_path(index_dir))
