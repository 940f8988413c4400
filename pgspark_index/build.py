"""Index build: webtext -> per-unit compressed posting-list segments + lineage.

Spark-first re-expression of pgstream's bulk parallel snapshot pipeline
(/root/reference/pkg/snapshot/generator/postgres/data/pg_snapshot_generator.go):

- pgstream splits a table into ctid page ranges and snapshots them with
  worker pools, recording per-table status for resume. We split the corpus
  into ``num_units`` deterministic work units (hash of url), build each
  unit as one Spark job, and commit a manifest row after the unit's files
  are fully written (commit-after-write, see manifest.py).
- pgstream picks Kafka partition keys to trade ordering vs skew
  (pkg/wal/processor/kafka/config.go:21-39). We hash-repartition on
  (term, salt) where head terms get a salt fan-out estimated from a
  sample — Zipf head terms would otherwise swamp single reducers; AQE
  does not rebalance applyInPandas/mapInPandas stages, so the salting is
  explicit.

Physical plan per unit (all relational parts stay in WholeStageCodegen;
Python appears only in the three Arrow-vectorized stages):

  scan (column-pruned: url, warc_ts, html, text)
   -> filter pmod(xxhash64(url), num_units) = unit        [unit predicate]
   -> window last-writer-wins per url                     [shuffle 1: url]
   -> persist deduped corpus slice (reused by 3 passes below)
   -> docs parquet: doclen_udf -> (doc_id, url, doclen)   [Arrow, int-only out]
   -> PARTIAL posting lists: tokenize + local group +
      delta/varbyte encode per map partition              [map-side combine]
   -> repartition(P, term, salt) hash, no sampling pass   [shuffle 2: blobs only]
   -> sortWithinPartitions(term, salt)
   -> mapInPandas(merge partials: one vectorized decode/
      sort/re-encode per partition, block-max metadata)   [Arrow, vectorized]
   -> segments parquet under segments/unit=<u>/

At 10^12 docs the unit count is chosen so one unit's tokenized form fits
the cluster's cache/disk comfortably (units are also the resume and
incremental-build granularity); within a unit parallelism is ``partitions``.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from . import codecs, manifest
from .extract import (
    EXPLODED_SCHEMA,
    doclen_udf,
    explode_token_counts_fn,
    webtext_to_docs,
)

SEG_SCHEMA = (
    "term string, salt int, part_id int, df bigint, cf bigint, "
    "block_last_doc array<bigint>, block_max_tf array<int>, "
    "block_min_dl array<int>, block_offset array<bigint>, postings binary"
)

DOCS_SCHEMA = "doc_id bigint, url string, doclen int"


def segments_path(index_dir: str) -> str:
    return os.path.join(index_dir, "segments")


def docs_path(index_dir: str) -> str:
    return os.path.join(index_dir, "docs")


_CHUNK_ROWS = 1 << 20  # ~1M postings (~50 MB of arrays) per vectorized flush
# partial-list chunks are larger: fewer flushes -> each (term, salt) emits
# fewer partials per task (less per-group overhead, fewer merge inputs).
# ~8M postings = ~250 MB working set per task.
_PARTIAL_CHUNK_ROWS = 1 << 23


PARTIAL_SCHEMA = "term string, salt int, df bigint, postings binary"

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _doc_salt(doc_ids: np.ndarray, fanouts: np.ndarray) -> np.ndarray:
    """Deterministic per-doc salt in [0, fanout): golden-ratio mix of the
    doc_id (cheap numpy, engine-internal — nothing external depends on it)."""
    u = doc_ids.astype(np.int64).view(np.uint64) * _GOLDEN
    return ((u >> np.uint64(33)).astype(np.int64) % fanouts).astype(np.int32)


def make_partial_postings_fn(salt_map: dict[str, int], max_fanout: int = 64):
    """mapInPandas factory: corpus rows -> PARTIAL posting lists.

    The map-side combine of the classic MapReduce index build: each input
    partition tokenizes its docs, groups locally by (term, salt), and emits
    delta+varbyte-encoded partial lists. Only compressed blobs cross the
    shuffle (~3.5 B/posting instead of ~14+ B/posting raw rows), and the
    JVM never materializes per-posting rows — Arrow row counts drop from
    O(postings) to O(distinct terms per partition).

    Partial lists may be emitted more than once per (term, salt, partition)
    (chunked flushes) — the merge stage handles any number of partials."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        from .textnorm import extract_text as _extract, token_counts as _tc

        acc_doc, acc_dl, acc_tf = [], [], []
        acc_term: list[str] = []
        buffered = 0

        def flush():
            nonlocal acc_doc, acc_dl, acc_tf, acc_term, buffered
            if buffered == 0:
                return None
            doc = np.concatenate(acc_doc)
            dl = np.concatenate(acc_dl)
            tf = np.concatenate(acc_tf)
            codes, uniques = pd.factorize(np.asarray(acc_term, dtype=object))
            fan = np.fromiter(
                (salt_map.get(u, 1) for u in uniques), dtype=np.int64, count=len(uniques)
            )
            salt = _doc_salt(doc, fan[codes])
            key = codes.astype(np.int64) * max_fanout + salt
            order = np.lexsort((doc, key))
            doc, dl, tf, key = doc[order], dl[order], tf[order], key[order]
            starts = np.concatenate(([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
            rows = codecs.encode_groups(starts, doc, tf, dl, with_blocks=False)
            out = pd.DataFrame(
                {
                    "term": uniques[(key[starts] // max_fanout)],
                    "salt": (key[starts] % max_fanout).astype("int32"),
                    "df": np.array([r["df"] for r in rows], dtype="int64"),
                    "postings": [r["postings"] for r in rows],
                }
            )
            acc_doc, acc_dl, acc_tf, acc_term = [], [], [], []
            buffered = 0
            return out

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            htmls = pdf["html"] if "html" in pdf.columns else [None] * n
            texts = pdf["text"]
            doc_ids = pdf["doc_id"].to_numpy(dtype="int64")
            for i, (h, t) in enumerate(zip(htmls, texts)):
                norm = _extract(
                    h if isinstance(h, (bytes, bytearray)) else None,
                    t if isinstance(t, str) else None,
                )
                dl_i, counts = _tc(norm)
                if not counts:
                    continue
                m = len(counts)
                acc_doc.append(np.full(m, doc_ids[i], dtype="int64"))
                acc_dl.append(np.full(m, dl_i, dtype="int64"))
                acc_term.extend(c[0] for c in counts)
                acc_tf.append(np.fromiter((c[1] for c in counts), dtype=np.int64, count=m))
                buffered += m
            if buffered >= _PARTIAL_CHUNK_ROWS:
                out = flush()
                if out is not None and len(out):
                    yield out
        out = flush()
        if out is not None and len(out):
            yield out

    return fn


def _merge_partials_fn(batches):
    """mapInPandas: shuffled partial lists (sorted by term, salt) -> final
    segment rows. Fully vectorized: one varbyte decode over the whole
    partition's concatenated blobs, segmented gap-cumsum to rebuild doc ids,
    one lexsort per partition, one encode_groups pass.

    Partition memory = decoded posting arrays for this partition's terms
    (~24 B/posting); size `partitions` so that stays comfortable — the same
    knob that bounds any sort/merge operator."""
    import pandas as pd
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1

    terms_l, salts_l, dfs_l, blobs_l = [], [], [], []
    for pdf in batches:
        if len(pdf) == 0:
            continue
        terms_l.append(pdf["term"].to_numpy())
        salts_l.append(pdf["salt"].to_numpy(dtype=np.int32))
        dfs_l.append(pdf["df"].to_numpy(dtype=np.int64))
        blobs_l.append(pdf["postings"].to_numpy())
    if not terms_l:
        return
    terms = np.concatenate(terms_l)
    salts = np.concatenate(salts_l)
    dfs = np.concatenate(dfs_l)
    blobs = np.concatenate(blobs_l)

    stream = codecs.varbyte_decode(b"".join(blobs))
    total = int(dfs.sum())
    assert stream.size == 3 * total, (stream.size, total)
    # per-value row ownership and within-row phase (gap/tf/dl)
    row_id = np.repeat(np.arange(dfs.size), 3 * dfs)
    row_val_starts = np.zeros(dfs.size, dtype=np.int64)
    np.cumsum(3 * dfs[:-1], out=row_val_starts[1:])
    phase = np.arange(stream.size) - row_val_starts[row_id]
    gaps = stream[phase % 3 == 0]
    tf = stream[phase % 3 == 1].astype(np.int64)
    dl = stream[phase % 3 == 2].astype(np.int64)
    # segmented cumsum: doc_u[i] = sum of gaps within its row up to i
    c = np.cumsum(gaps, dtype=np.uint64)
    gap_row_starts = np.zeros(dfs.size, dtype=np.int64)
    np.cumsum(dfs[:-1], out=gap_row_starts[1:])
    base = c[gap_row_starts] - gaps[gap_row_starts]
    doc_u = c - np.repeat(base, dfs)
    doc = codecs._to_signed(doc_u)

    # group = (term, salt) run over ROWS (input sorted by term, salt)
    row_grp_change = np.flatnonzero(
        (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    ) + 1
    row_grp_id = np.zeros(dfs.size, dtype=np.int64)
    row_grp_id[row_grp_change] = 1
    row_grp_id = np.cumsum(row_grp_id)
    grp_per_posting = np.repeat(row_grp_id, dfs)

    order = np.lexsort((doc, grp_per_posting))
    doc, tf, dl, grp_sorted = doc[order], tf[order], dl[order], grp_per_posting[order]
    enc_starts = np.concatenate(([0], np.flatnonzero(grp_sorted[1:] != grp_sorted[:-1]) + 1))
    rows = codecs.encode_groups(enc_starts, doc, tf, dl)

    grp_first_row = np.concatenate(([0], row_grp_change))
    out = pd.DataFrame(
        {
            "term": terms[grp_first_row],
            "salt": salts[grp_first_row].astype("int32"),
            "part_id": np.full(len(rows), pid, dtype="int32"),
            "df": np.array([r["df"] for r in rows], dtype="int64"),
            "cf": np.array([r["cf"] for r in rows], dtype="int64"),
            "block_last_doc": [r["block_last_doc"].tolist() for r in rows],
            "block_max_tf": [r["block_max_tf"].tolist() for r in rows],
            "block_min_dl": [r["block_min_dl"].tolist() for r in rows],
            "block_offset": [r["block_offset"].tolist() for r in rows],
            "postings": [r["postings"] for r in rows],
        }
    )
    yield out


def plan_salts(
    ded: DataFrame,
    sample_fraction: float,
    salt_target: int,
    max_fanout: int,
    seed: int = 7,
) -> list[tuple[str, int]]:
    """Estimate head-term doc frequencies from a doc sample and assign each
    an explicit salt fan-out so no (term, salt) group exceeds ~salt_target
    postings. Zipf tail terms get fanout 1 (no extra shuffle width).

    The reference precedent is choosing the Kafka partition-key strategy to
    control skew (pkg/wal/processor/kafka/config.go:21-39); here the 'key
    strategy' is computed per term from data."""
    if sample_fraction >= 1.0:
        sample = ded
        scale = 1.0
    else:
        sample = ded.sample(fraction=sample_fraction, seed=seed)
        scale = 1.0 / sample_fraction
    head = (
        sample.mapInPandas(explode_token_counts_fn, schema=EXPLODED_SCHEMA)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * scale > salt_target)
        .collect()
    )
    plan = []
    for r in head:
        fanout = min(max_fanout, int(math.ceil(r["cnt"] * scale / salt_target)))
        if fanout > 1:
            plan.append((r["term"], fanout))
    return plan


def webtext_unit_provider(webtext_df: DataFrame):
    """Unit provider for the (url, warc_ts, html, text, lang) input shape.

    The unit predicate is on url (the doc identity source), so Catalyst
    pushes it below the dedup window straight into the scan — each unit job
    reads only its slice of the input."""

    def provider(unit: int, num_units: int) -> DataFrame:
        unit_df = webtext_df.filter(
            F.pmod(F.xxhash64(F.col("url")), F.lit(num_units)) == unit
        )
        return webtext_to_docs(unit_df)

    return provider


def docs_unit_provider(docs_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """Unit provider for already-identified corpora (e.g. a documents table
    with a native doc_id). No dedup/extraction — text is normalized inside
    the tokenize stage."""

    def provider(unit: int, num_units: int) -> DataFrame:
        return docs_df.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_units)) == unit
        ).select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.lit(None).cast("string").alias("url"),
            F.col(text_col).alias("text"),
        )

    return provider


def build_unit(
    spark: SparkSession,
    docs_provider,
    index_dir: str,
    unit: int,
    num_units: int,
    partitions: int,
    input_snapshot_id: int = 0,
    salt_target: int = 100_000,
    sample_fraction: float = 0.02,
    max_fanout: int = 64,
) -> dict:
    """Build one work unit end-to-end and commit its manifest row."""
    src = docs_provider(unit, num_units)
    html_col = F.col("html") if "html" in src.columns else F.lit(None).cast("binary")
    # persist the deduped corpus slice, NOT a tokenized nested column:
    # Arrow-converting array<struct<term,tf>> costs ~10x the tokenize itself,
    # so tokenization runs twice over the cached slice (docs pass emits one
    # int; postings pass emits flat rows) — far cheaper than nesting once.
    ded = src.select("doc_id", "url", html_col.alias("html"), "text").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        docs_obs = Observation()
        docs_out = ded.select(
            "doc_id", "url", doclen_udf(F.col("html"), F.col("text")).alias("doclen")
        ).observe(docs_obs, F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("sum_dl"))
        docs_out.write.mode("overwrite").parquet(
            os.path.join(docs_path(index_dir), f"unit={unit}")
        )

        salt_plan = dict(plan_salts(ded, sample_fraction, salt_target, max_fanout))
        partials = ded.mapInPandas(
            make_partial_postings_fn(salt_plan, max_fanout), schema=PARTIAL_SCHEMA
        )

        seg_obs = Observation()
        # Map-side combine: only compressed partial lists cross this shuffle
        # (~3.5 B/posting vs ~14+ B/posting raw rows), and JVM<->Arrow row
        # counts are O(distinct terms), not O(postings). Hash repartition
        # (no range-sampler pass); sortWithinPartitions keeps every output
        # FILE term-sorted so parquet row-group min/max stats stay selective
        # for the query-time term IN (...) pushdown.
        segments = (
            partials.repartition(partitions, "term", "salt")
            .sortWithinPartitions("term", "salt")
            .mapInPandas(_merge_partials_fn, schema=SEG_SCHEMA)
            .observe(
                seg_obs,
                F.count(F.lit(1)).alias("term_rows"),
                F.sum(F.length("postings")).alias("bytes"),
            )
        )
        segments.write.mode("overwrite").parquet(
            os.path.join(segments_path(index_dir), f"unit={unit}")
        )

        row = {
            "segment_id": f"u{unit}",
            "unit": unit,
            "input_snapshot_id": input_snapshot_id,
            "row_count": int(docs_obs.get["n"]),
            "sum_doclen": int(docs_obs.get["sum_dl"] or 0),
            "term_count": int(seg_obs.get["term_rows"] or 0),
            "bytes": int(seg_obs.get["bytes"] or 0),
            "status": manifest.STATUS_COMPLETED,
        }
        manifest.commit_unit(index_dir, row)
        return row
    finally:
        ded.unpersist()


def build_index(
    spark: SparkSession,
    source: DataFrame | object,
    index_dir: str,
    num_units: int = 4,
    partitions: int | None = None,
    resume: bool = True,
    input_snapshot_id: int = 0,
    salt_target: int = 100_000,
    sample_fraction: float = 0.02,
    max_fanout: int = 64,
    units: list[int] | None = None,
) -> dict:
    """Full (resumable) build. ``units`` limits work for tests/incremental.

    ``source`` is either a webtext DataFrame (url, warc_ts, html, text,
    lang) or a unit-provider callable (see *_unit_provider).

    Resume = set subtraction of requested work minus committed manifest rows
    (snapshot_generator_recorder.go:241-379's anti-join, driver-side here
    because the unit list is tiny; the data-scale anti-join lives in the
    incremental path)."""
    docs_provider = source if callable(source) else webtext_unit_provider(source)
    partitions = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    requested = list(range(num_units)) if units is None else list(units)
    todo = requested
    if resume:
        done = manifest.completed_units(index_dir, input_snapshot_id)
        todo = [u for u in requested if u not in done]
    built = []
    for u in todo:
        built.append(
            build_unit(
                spark,
                docs_provider,
                index_dir,
                u,
                num_units,
                partitions,
                input_snapshot_id,
                salt_target,
                sample_fraction,
                max_fanout,
            )
        )
    return {
        "built_units": [r["unit"] for r in built],
        "skipped_units": [u for u in requested if u not in todo],
    }
