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
Python appears in exactly ONE Arrow-vectorized tokenize stage — the round-1
design ran three tokenization passes per unit (doclen, salt sample,
partials); they are now a single pass whose output is persisted instead of
the raw corpus slice):

  scan (column-pruned: url, warc_ts, html, text)
   -> filter pmod(xxhash64(url), num_units) = unit        [unit predicate]
   -> window last-writer-wins per url                     [shuffle 1: url]
   -> ONE tokenize pass (mapInPandas): emits BOTH
        kind=0 doc rows (doc_id, url, doclen)             [docs by-product]
        kind=1 PARTIAL posting lists: local group +
        delta/varbyte encode per map partition            [map-side combine]
   -> persist the combined output (compressed blobs + doc
      rows — far smaller than the raw slice)
   -> docs parquet  = filter kind=0                       [cache read]
   -> segments      = filter kind=1
      -> repartition(P, term, salt) hash                  [shuffle 2: blobs only]
      -> sortWithinPartitions(term, salt)
      -> mapInPandas(merge partials: one vectorized decode/
         sort/re-encode per partition, block-max metadata) [Arrow, vectorized]
      -> segments parquet under segments/unit=<u>/

The skew-salt plan is computed ONCE PER BUILD from a window-free sample of
the raw source (plan_salts_source) and reused by every unit — not one
sample pass per unit.

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

# ONE tokenize pass emits two row kinds (union schema): kind=0 doc rows and
# kind=1 partial posting lists. Sentinels (not NULLs) keep every column a
# plain non-nullable Arrow primitive.
COMBINED_SCHEMA = (
    "kind int, term string, salt int, df bigint, postings binary, "
    "doc_id bigint, url string, doclen int"
)

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _doc_salt(doc_ids: np.ndarray, fanouts: np.ndarray) -> np.ndarray:
    """Deterministic per-doc salt in [0, fanout): golden-ratio mix of the
    doc_id (cheap numpy, engine-internal — nothing external depends on it)."""
    u = doc_ids.astype(np.int64).view(np.uint64) * _GOLDEN
    return ((u >> np.uint64(33)).astype(np.int64) % fanouts).astype(np.int32)


def make_tokenize_fn(
    salt_map: dict[str, int],
    max_fanout: int = 64,
    max_term_bytes: int | None = 32766,
):
    """mapInPandas factory: corpus rows -> doc rows + PARTIAL posting lists
    in ONE tokenization pass (COMBINED_SCHEMA).

    The map-side combine of the classic MapReduce index build: each input
    partition tokenizes its docs, groups locally by (term, salt), and emits
    delta+varbyte-encoded partial lists. Only compressed blobs cross the
    shuffle (~3.5 B/posting instead of ~14+ B/posting raw rows), and the
    JVM never materializes per-posting rows — Arrow row counts drop from
    O(postings) to O(distinct terms per partition).

    The docs side table (doc_id, url, doclen) falls out of the same pass as
    kind=0 rows — the reference precedent for one-touch row adaptation is
    pg_snapshot_generator.go:409-467 (each scanned row adapted exactly once).

    Partial lists may be emitted more than once per (term, salt, partition)
    (chunked flushes) — the merge stage handles any number of partials."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        from .textnorm import extract_text as _extract, token_counts as _tc

        acc_doc, acc_dl, acc_tf = [], [], []
        acc_term: list[str] = []
        buffered = 0

        dropped_postings = 0

        def flush():
            nonlocal acc_doc, acc_dl, acc_tf, acc_term, buffered, dropped_postings
            if buffered == 0:
                return None
            doc = np.concatenate(acc_doc)
            dl = np.concatenate(acc_dl)
            tf = np.concatenate(acc_tf)
            codes, uniques = pd.factorize(np.asarray(acc_term, dtype=object))
            if max_term_bytes is not None:
                # Lucene-analog oversize guard (term byte cap 32766,
                # opensearch_mapper.go:44-53): drop oversized terms from the
                # postings (doclen keeps counting them, like Lucene norms),
                # account the drops. Vectorized over DISTINCT terms only.
                term_lens = np.fromiter(
                    (len(u) for u in uniques), dtype=np.int64, count=len(uniques)
                )
                bad = term_lens > max_term_bytes
                if bad.any():
                    keep = ~bad[codes]
                    dropped_postings += int((~keep).sum())
                    doc, dl, tf, codes = doc[keep], dl[keep], tf[keep], codes[keep]
                    if doc.size == 0:
                        acc_doc, acc_dl, acc_tf, acc_term = [], [], [], []
                        buffered = 0
                        return None
            fan = np.fromiter(
                (salt_map.get(u, 1) for u in uniques), dtype=np.int64, count=len(uniques)
            )
            salt = _doc_salt(doc, fan[codes])
            key = codes.astype(np.int64) * max_fanout + salt
            order = np.lexsort((doc, key))
            doc, dl, tf, key = doc[order], dl[order], tf[order], key[order]
            starts = np.concatenate(([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
            rows = codecs.encode_groups(starts, doc, tf, dl, with_blocks=False)
            ng = len(rows)
            out = pd.DataFrame(
                {
                    "kind": np.ones(ng, dtype="int32"),
                    "term": uniques[(key[starts] // max_fanout)],
                    "salt": (key[starts] % max_fanout).astype("int32"),
                    "df": np.array([r["df"] for r in rows], dtype="int64"),
                    "postings": [r["postings"] for r in rows],
                    "doc_id": np.full(ng, -1, dtype="int64"),
                    "url": np.full(ng, "", dtype=object),
                    "doclen": np.full(ng, -1, dtype="int32"),
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
            doclens = np.zeros(n, dtype=np.int32)
            for i, (h, t) in enumerate(zip(htmls, texts)):
                norm = _extract(
                    h if isinstance(h, (bytes, bytearray)) else None,
                    t if isinstance(t, str) else None,
                )
                dl_i, counts = _tc(norm)
                doclens[i] = dl_i
                if not counts:
                    continue
                m = len(counts)
                acc_doc.append(np.full(m, doc_ids[i], dtype="int64"))
                acc_dl.append(np.full(m, dl_i, dtype="int64"))
                acc_term.extend(c[0] for c in counts)
                acc_tf.append(np.fromiter((c[1] for c in counts), dtype=np.int64, count=m))
                buffered += m
            urls = pdf["url"] if "url" in pdf.columns else np.full(n, "", dtype=object)
            yield pd.DataFrame(
                {
                    "kind": np.zeros(n, dtype="int32"),
                    "term": np.full(n, "", dtype=object),
                    "salt": np.full(n, -1, dtype="int32"),
                    "df": np.zeros(n, dtype="int64"),
                    "postings": [b""] * n,
                    "doc_id": doc_ids,
                    "url": urls,
                    "doclen": doclens,
                }
            )
            if buffered >= _PARTIAL_CHUNK_ROWS:
                out = flush()
                if out is not None and len(out):
                    yield out
        out = flush()
        if out is not None and len(out):
            yield out
        if dropped_postings:
            # kind=2 metrics row: dropped-posting accounting for lineage
            # (the reference's dropped-row counters,
            # wal_kafka_batch_writer.go:168-179 / search_store.go:137-143).
            yield pd.DataFrame(
                {
                    "kind": np.array([2], dtype="int32"),
                    "term": np.array([""], dtype=object),
                    "salt": np.array([-1], dtype="int32"),
                    "df": np.array([dropped_postings], dtype="int64"),
                    "postings": [b""],
                    "doc_id": np.array([-1], dtype="int64"),
                    "url": np.array([""], dtype=object),
                    "doclen": np.array([-1], dtype="int32"),
                }
            )

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


def plan_salts_source(
    source: DataFrame | object,
    num_units: int,
    sample_fraction: float,
    salt_target: int,
    max_fanout: int,
    seed: int = 7,
) -> dict[str, int]:
    """ONE salt plan per build (not per unit) from a window-free sample.

    For a webtext DataFrame the sample skips the LWW dedup window entirely
    (recrawl duplicates only inflate head-term counts, which is harmless
    for a fanout heuristic); for a provider callable it samples the full
    provider output. The per-unit group-size target is salt_target, so the
    global plan targets salt_target * num_units postings per term."""
    if callable(source):
        ded = source(0, 1)
    else:
        html_col = (
            F.col("html") if "html" in source.columns else F.lit(None).cast("binary")
        )
        ded = source.select(
            F.xxhash64("url").alias("doc_id"), html_col.alias("html"), "text"
        )
    return dict(
        plan_salts(
            ded, sample_fraction, salt_target * max(1, num_units), max_fanout, seed
        )
    )


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
    salt_plan: dict[str, int] | None = None,
    max_term_bytes: int | None = 32766,
    max_id_bytes: int | None = 512,
) -> dict:
    """Build one work unit end-to-end and commit its manifest row.

    ``salt_plan``: the per-build skew plan from plan_salts_source; when None
    (direct callers) one is computed from this unit's slice."""
    src = docs_provider(unit, num_units)
    html_col = F.col("html") if "html" in src.columns else F.lit(None).cast("binary")
    ded = src.select("doc_id", "url", html_col.alias("html"), "text")
    if max_id_bytes is not None:
        # doc-identity oversize guard (search_store.go:137-143: IDs > 512 B
        # are skipped): drop the doc, account it below via row-count delta.
        ded = ded.filter(
            F.col("url").isNull() | (F.octet_length("url") <= max_id_bytes)
        )
    if salt_plan is None:
        salt_plan = dict(plan_salts(ded, sample_fraction, salt_target, max_fanout))
    # ONE tokenize pass; persist its (compressed) output — partial posting
    # blobs + int doc rows — instead of the raw corpus slice. Both the docs
    # write and the segment shuffle read from this cache, so text is
    # extracted and tokenized exactly once per document.
    combined = ded.mapInPandas(
        make_tokenize_fn(salt_plan, max_fanout, max_term_bytes),
        schema=COMBINED_SCHEMA,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        docs_obs = Observation()
        docs_out = (
            combined.filter(F.col("kind") == 0)
            .select("doc_id", "url", "doclen")
            .observe(
                docs_obs, F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("sum_dl")
            )
        )
        docs_out.write.mode("overwrite").parquet(
            os.path.join(docs_path(index_dir), f"unit={unit}")
        )

        dropped_terms = (
            combined.filter(F.col("kind") == 2).agg(F.sum("df")).collect()[0][0] or 0
        )

        partials = combined.filter(F.col("kind") == 1).select(
            "term", "salt", "df", "postings"
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
            "dropped_terms": int(dropped_terms),
            "status": manifest.STATUS_COMPLETED,
        }
        manifest.commit_unit(index_dir, row)
        return row
    finally:
        combined.unpersist()


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
    ignore_unit_errors: bool = False,
    max_term_bytes: int | None = 32766,
    max_id_bytes: int | None = 512,
) -> dict:
    """Full (resumable) build. ``units`` limits work for tests/incremental.

    ``source`` is either a webtext DataFrame (url, warc_ts, html, text,
    lang) or a unit-provider callable (see *_unit_provider).

    Resume = set subtraction of requested work minus committed manifest rows
    (snapshot_generator_recorder.go:241-379's anti-join, driver-side here
    because the unit list is tiny; the data-scale anti-join lives in the
    incremental path). A failing unit is recorded in the manifest with
    status=failed + error (the recorder's failure ledger) and retried on
    the next resume; with ``ignore_unit_errors`` the build continues past
    it, DATALOSS-logged (the reference's ignore_send_errors knob,
    wal_batch_sender.go:281-283,353-367)."""
    docs_provider = source if callable(source) else webtext_unit_provider(source)
    partitions = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    requested = list(range(num_units)) if units is None else list(units)
    todo = requested
    if resume:
        done = manifest.completed_units(index_dir, input_snapshot_id)
        todo = [u for u in requested if u not in done]
    salt_plan = plan_salts_source(
        source, num_units, sample_fraction, salt_target, max_fanout
    ) if todo else {}
    built, failed = [], []
    for u in todo:
        try:
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
                    salt_plan=salt_plan,
                    max_term_bytes=max_term_bytes,
                    max_id_bytes=max_id_bytes,
                )
            )
        except Exception as exc:  # noqa: BLE001 — ledger + re-raise/skip
            manifest.commit_unit(
                index_dir,
                {
                    "segment_id": f"u{u}",
                    "unit": u,
                    "input_snapshot_id": input_snapshot_id,
                    "status": manifest.STATUS_FAILED,
                    "error": f"{type(exc).__name__}: {exc}"[:2000],
                },
            )
            if not ignore_unit_errors:
                raise
            print(f"DATALOSS unit={u} skipped after error: {exc}")
            failed.append(u)
    return {
        "built_units": [r["unit"] for r in built],
        "skipped_units": [u for u in requested if u not in todo],
        "failed_units": failed,
    }
