"""Spark vectorized extract / normalize / tokenize stages.

pgstream analog: the deterministic transformer chain applied per column
(/root/reference/pkg/transformers/, wiring
/root/reference/pkg/wal/processor/transformer/wal_transformer.go:110-195)
and the sanitizer (wal_sanitizer.go:15-60). Everything here is an
Arrow-batched pandas UDF — no row-at-a-time Spark Python UDFs anywhere
(input_hint requirement). The string work inside a batch uses the pinned
pure-stdlib functions from textnorm so output is byte-identical across
machines and parallelism levels.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

EXPLODED_SCHEMA = "doc_id bigint, dl int, term string, tf int"


def explode_token_counts_fn(batches):
    """mapInPandas: (doc_id, [url], [html], text) -> FLAT (doc_id, dl, term, tf).

    Emits flat columns instead of an array<struct<term,tf>> column: Arrow
    conversion of nested python tuples costs ~10x the tokenize itself; flat
    string/int arrays are the fast path. Used by the salt planner's sample
    pass (the main build path goes further and emits encoded PARTIAL lists,
    see build.make_partial_postings_fn)."""
    from .textnorm import batch_token_stream as _bts

    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        htmls = pdf["html"].tolist() if "html" in pdf.columns else [None] * n
        texts = pdf["text"].tolist()
        doc_ids = pdf["doc_id"].to_numpy(dtype="int64")
        dls, doc_idx, codes, tfs, uniques, _ = _bts(htmls, texts)
        if codes.size == 0:
            continue
        yield pd.DataFrame(
            {
                "doc_id": doc_ids[doc_idx],
                "dl": dls[doc_idx].astype("int32"),
                "term": uniques[codes],
                "tf": tfs.astype("int32"),
            }
        )


def webtext_to_docs(df: DataFrame) -> DataFrame:
    """(url, warc_ts, html, text, lang) -> (doc_id, url, html, text, version).

    doc_id = xxhash64(url): stable identity under recrawl, the analog of
    pgstream's immutable column/table IDs (docs/architecture.md:47).
    ``version`` (= warc_ts) rides along so the build's range-partitioned
    sort can do streaming last-writer-wins dedup (LSN-as-version,
    search_adapter.go:179-184) without a separate Window shuffle.
    Extraction happens inside the downstream tokenize stage; Catalyst
    prunes the scan to these columns.
    """
    return df.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        "html",
        "text",
        F.col("warc_ts").alias("version"),
    )
