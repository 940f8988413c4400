"""Query engine: top-k BM25 over the segment index.

Lifecycle (SURVEY.md §3.4):
  driver: lexicon lookup for the query terms (parquet scan with an IN
          pushdown over the term-sorted lexicon -> few rows) -> idf per
          term from global df; global stats from lineage
  executors: segments parquet scanned with term IN (...) pushdown — only
          the query terms' posting rows are read (row-group pruning works
          because segment files are written sorted by term) -> per-unit
          block-max scoring in an Arrow-grouped UDF (a doc's postings live
          entirely in one unit, so unit-local scores are final)
  driver: global top-k via orderBy(score DESC, doc_id ASC).limit(k) —
          Spark compiles this to TakeOrderedAndProject (distributed
          partial top-k, no full sort).

The small idf/avgdl dict rides the UDF closure (broadcast-equivalent at
this size — a handful of floats per query term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import bm25, merge, wand
from .build import segments_path


def _tombstone_excluder(index_dir: str):
    """-> callable(unit) -> sorted int64 exclude array or None.

    Unit-scoped: a tombstone (doc, snapshot s) suppresses the doc only in
    units built from snapshots OLDER than s — the snapshot-s delta unit
    holds the live version (LSN-as-version semantics, search_adapter.go:179-184)."""
    import numpy as np

    from .incremental import load_tombstones, unit_snapshots

    tombs = load_tombstones(index_dir)
    if tombs is None:
        return lambda unit: None
    docs, snaps = tombs
    usnap = unit_snapshots(index_dir)

    def for_unit(unit):
        ex = docs[snaps > usnap.get(int(unit), 0)]
        return ex if ex.size else None

    return for_unit

RESULT_SCHEMA = "doc_id bigint, score double"
BATCH_RESULT_SCHEMA = "query_id int, doc_id bigint, score double"


def _term_idfs(spark: SparkSession, index_dir: str, terms: list[str], n_docs: int) -> dict[str, float]:
    """Lexicon lookup: term -> idf (global df). Missing terms are simply
    absent (score 0 everywhere), like any search engine.

    Read directly with pyarrow on the driver — the lexicon is range-
    partitioned and sorted by term, so parquet row-group statistics prune
    to a handful of row groups; no Spark job is scheduled for the (tiny)
    lookup, which roughly halves single-query latency."""
    if not terms:
        return {}
    import glob as _glob
    import os as _os

    import pyarrow.dataset as ds

    files = sorted(
        _glob.glob(_os.path.join(merge.lexicon_path(index_dir), "*.parquet"))
    )
    dataset = ds.dataset(files, format="parquet")
    table = dataset.to_table(
        columns=["term", "df_total"], filter=ds.field("term").isin(terms)
    )
    out = {}
    for term, df_total in zip(table["term"].to_pylist(), table["df_total"].to_pylist()):
        out[term] = float(bm25.idf(n_docs, df_total))
    return out


def _rows_to_lists(pdf, idfs: dict[str, float]) -> list[dict]:
    with_pos = "positions" in pdf.columns
    return [
        {
            "term": r.term,
            "idf": idfs[r.term],
            "df": int(r.df),
            "postings": r.postings,
            "block_last_doc": r.block_last_doc,
            "block_max_tf": r.block_max_tf,
            "block_min_dl": r.block_min_dl,
            "block_offset": r.block_offset,
            **({"positions": r.positions} if with_pos else {}),
        }
        for r in pdf.itertuples()
    ]


def search(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    k: int = 10,
    strategy: str = "maxscore",
    mode: str = "or",
    filter_df: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 -> DataFrame(doc_id, score), (score DESC, doc_id ASC).

    ``mode``: "or" (default — any query term) or "and" (conjunctive: docs
    must contain every term; the reference's search traffic shape via the
    OpenSearch bool/must DSL).
    ``filter_df``: optional DataFrame with a doc_id column — a metadata
    pre-filter (e.g. docs.filter(lang = 'en')). Implemented scale-first:
    units emit ALL their scored docs, one distributed semi-join applies the
    filter, then TakeOrderedAndProject takes the global top-k — no doc-id
    collect to the driver, no literal IN lists.

    Between an incremental delta and the next compaction, n_docs/avgdl are
    tombstone-corrected at merge time; per-term df still counts superseded
    versions (Lucene deleted-docs-affect-docFreq semantics); tombstoned
    docs are excluded from results either way."""
    stats = merge.load_stats(index_dir)
    terms = sorted(set(terms))
    idfs = _term_idfs(spark, index_dir, terms, stats["n_docs"])
    present = sorted(idfs)
    if not present or (mode == "and" and len(present) < len(terms)):
        return spark.createDataFrame([], RESULT_SCHEMA)
    avgdl = float(stats["avgdl"])
    scorer = wand.score_conjunctive if mode == "and" else wand.STRATEGIES[strategy]
    excluder = _tombstone_excluder(index_dir)
    # with a metadata filter, per-unit top-k pruning is unsafe (the filter
    # may remove arbitrarily many of a unit's best docs) — score everything
    # that matches, filter distributively, then take the global top-k
    unit_k = stats["n_docs"] if filter_df is not None else k

    seg = (
        spark.read.parquet(segments_path(index_dir))
        .filter(F.col("term").isin(present))
        .select(
            "unit", "term", "df", "postings",
            "block_last_doc", "block_max_tf", "block_min_dl", "block_offset",
        )
    )

    def score_unit(key, pdf):
        import pandas as pd

        docs, scores = scorer(
            _rows_to_lists(pdf, idfs), avgdl, unit_k, exclude=excluder(key[0])
        )
        return pd.DataFrame({"doc_id": docs, "score": scores})

    per_unit = seg.groupBy("unit").applyInPandas(score_unit, schema=RESULT_SCHEMA)
    if filter_df is not None:
        per_unit = per_unit.join(filter_df.select("doc_id"), "doc_id", "left_semi")
    return per_unit.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_ranged(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    k: int = 10,
    ranges: int = 8,
) -> DataFrame:
    """Top-k BM25 with DOC-RANGE-PARALLEL scoring — the scale path for
    units whose posting lists are too large for one scorer task.

    ``search`` groups by unit (one scorer task per unit: correct, but a
    single giant unit serializes scoring). Here the int64 doc-id space
    (doc_id = xxhash64 -> uniform) is split into ``ranges`` equal windows
    (power of two) and every (term, salt) row is SLICED JVM-SIDE at block
    boundaries: slice(block arrays) + substr(postings bytes) per
    overlapping range, so each scorer task receives only its byte window
    (~1x total transfer, duplicating only boundary blocks, never whole
    head-term blobs). Each doc's postings for ALL query terms land in the
    same (unit, range) group — per-doc sums are complete and bit-exact
    with ``search``; per-range top-k then TakeOrderedAndProject merges.

    Scoring work per query stays O(total postings of the query terms) but
    now spreads across ranges x units tasks: latency scales with cores."""
    assert ranges >= 2 and (ranges & (ranges - 1)) == 0, "ranges must be a power of 2"
    stats = merge.load_stats(index_dir)
    terms = sorted(set(terms))
    idfs = _term_idfs(spark, index_dir, terms, stats["n_docs"])
    present = sorted(idfs)
    if not present:
        return spark.createDataFrame([], RESULT_SCHEMA)
    avgdl = float(stats["avgdl"])
    excluder = _tombstone_excluder(index_dir)

    INT64_MIN = -(1 << 63)
    step = (1 << 64) // ranges
    bounds = [INT64_MIN + r * step for r in range(ranges)] + [None]  # hi of last = +inf

    seg = (
        spark.read.parquet(segments_path(index_dir))
        .filter(F.col("term").isin(present))
        .select(
            "unit", "term", "postings",
            "block_last_doc", "block_offset",
        )
    )
    nb = F.size("block_last_doc")
    slices = []
    for r in range(ranges):
        lo = bounds[r]
        hi = bounds[r + 1]
        # first block whose last_doc >= lo … first block whose last_doc >= hi
        # (that block straddles the boundary and belongs to BOTH windows;
        # the scorer's [lo, hi) mask de-duplicates its docs)
        b_lo = (
            F.size(F.filter("block_last_doc", lambda x: x < F.lit(lo)))
            if r > 0
            else F.lit(0)
        )
        b_hi = (
            F.least(
                F.size(F.filter("block_last_doc", lambda x: x < F.lit(hi))),
                nb - 1,
            )
            if hi is not None
            else nb - 1
        )
        byte_lo = F.element_at("block_offset", b_lo + 1)
        byte_hi = F.when(
            b_hi + 1 < nb, F.element_at("block_offset", b_hi + 2)
        ).otherwise(F.octet_length("postings"))
        slices.append(
            F.struct(
                F.lit(r).alias("rid"),
                F.lit(lo).alias("lo"),
                # non-null (sentinel int64-max for the last range) so the
                # column reaches pandas as exact int64, never float64
                F.lit(hi if hi is not None else (1 << 63) - 1).alias("hi_excl"),
                # prev_last must reach pandas as EXACT int64: a nullable
                # int column converts to float64 (precision loss on 19-digit
                # doc ids), so ship non-null value + flag
                F.coalesce(
                    F.when(b_lo > 0, F.element_at("block_last_doc", b_lo)),
                    F.lit(0).cast("long"),
                ).alias("prev_last"),
                (b_lo > 0).alias("has_prev"),
                F.when(
                    b_hi >= b_lo,
                    F.col("postings").substr(
                        byte_lo + 1, (byte_hi - byte_lo).cast("int")
                    ),
                ).alias("postings"),
            )
        )
    exploded = (
        seg.select(
            "unit", "term", F.explode(F.array(*slices)).alias("s")
        )
        .select(
            "unit",
            "term",
            F.col("s.rid").alias("rid"),
            F.col("s.lo").alias("lo"),
            F.col("s.hi_excl").alias("hi_excl"),
            F.col("s.prev_last").alias("prev_last"),
            F.col("s.has_prev").alias("has_prev"),
            F.col("s.postings").alias("postings"),
        )
        .filter(F.col("postings").isNotNull() & (F.octet_length("postings") > 0))
    )

    def score_range(key, pdf):
        import pandas as pd

        unit, _rid = key[0], key[1]
        lo = int(pdf["lo"].iloc[0])
        h = int(pdf["hi_excl"].iloc[0])
        hi = (1 << 63) if h == (1 << 63) - 1 else h
        lists = [
            {
                "term": r.term,
                "idf": idfs[r.term],
                "postings": r.postings,
                "prev_last": int(r.prev_last) if r.has_prev else None,
            }
            for r in pdf.itertuples()
        ]
        docs, scores = wand.score_range_sliced(
            lists, avgdl, k, lo, hi, exclude=excluder(unit)
        )
        return pd.DataFrame({"doc_id": docs, "score": scores})

    per_range = exploded.groupBy("unit", "rid").applyInPandas(
        score_range, schema=RESULT_SCHEMA
    )
    return per_range.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_phrase(
    spark: SparkSession,
    index_dir: str,
    phrase: list[str],
    k: int = 10,
) -> DataFrame:
    """Exact-phrase top-k (requires an index built with_positions=True).

    Matches docs where the phrase's tokens occur consecutively (token
    positions p, p+1, ..., the Lucene match_phrase semantics the reference
    gets from its OpenSearch text fields, opensearch_mapper.go:17-68);
    matching docs are ranked by BM25 over the phrase's distinct terms.
    -> DataFrame(doc_id, score), (score DESC, doc_id ASC)."""
    stats = merge.load_stats(index_dir)
    uniq_terms = sorted(set(phrase))
    idfs = _term_idfs(spark, index_dir, uniq_terms, stats["n_docs"])
    if len(idfs) < len(uniq_terms) or not phrase:
        return spark.createDataFrame([], RESULT_SCHEMA)
    avgdl = float(stats["avgdl"])
    excluder = _tombstone_excluder(index_dir)
    phrase_order = list(phrase)

    seg = (
        spark.read.parquet(segments_path(index_dir))
        .filter(F.col("term").isin(uniq_terms))
        .select(
            "unit", "term", "df", "postings", "positions",
            "block_last_doc", "block_max_tf", "block_min_dl", "block_offset",
        )
    )

    def score_unit(key, pdf):
        import pandas as pd

        lists = _rows_to_lists(pdf, idfs)
        by_term: dict[str, list[dict]] = {}
        for lst in lists:
            by_term.setdefault(lst["term"], []).append(lst)
        slot_lists = [by_term.get(t, []) for t in phrase_order]
        docs, scores = wand.score_phrase(slot_lists, avgdl, k, exclude=excluder(key[0]))
        return pd.DataFrame({"doc_id": docs, "score": scores})

    per_unit = seg.groupBy("unit").applyInPandas(score_unit, schema=RESULT_SCHEMA)
    return per_unit.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_min_should_match(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    min_should_match: int,
    k: int = 10,
) -> DataFrame:
    """OR with a should-count threshold: top-k BM25 over docs matching at
    least ``min_should_match`` distinct query terms (OpenSearch bool/should
    + minimum_should_match; m=1 is pure OR, m=len(terms) is AND).
    -> DataFrame(doc_id, score), (score DESC, doc_id ASC)."""
    stats = merge.load_stats(index_dir)
    terms = sorted(set(terms))
    idfs = _term_idfs(spark, index_dir, terms, stats["n_docs"])
    present = sorted(idfs)
    m = max(1, int(min_should_match))
    if len(present) < m:
        return spark.createDataFrame([], RESULT_SCHEMA)
    avgdl = float(stats["avgdl"])
    excluder = _tombstone_excluder(index_dir)

    seg = (
        spark.read.parquet(segments_path(index_dir))
        .filter(F.col("term").isin(present))
        .select(
            "unit", "term", "df", "postings",
            "block_last_doc", "block_max_tf", "block_min_dl", "block_offset",
        )
    )

    def score_unit(key, pdf):
        import pandas as pd

        docs, scores = wand.score_min_should(
            _rows_to_lists(pdf, idfs), avgdl, k, m, exclude=excluder(key[0])
        )
        return pd.DataFrame({"doc_id": docs, "score": scores})

    per_unit = seg.groupBy("unit").applyInPandas(score_unit, schema=RESULT_SCHEMA)
    return per_unit.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_proximity(
    spark: SparkSession,
    index_dir: str,
    phrase: list[str],
    slop: int = 0,
    k: int = 10,
) -> DataFrame:
    """Ordered-window proximity search (requires with_positions=True):
    each phrase word must follow the previous within ``slop`` intervening
    tokens (slop=0 = exact phrase — the ordered variant of Lucene's sloppy
    match_phrase). -> DataFrame(doc_id, score), (score DESC, doc_id ASC)."""
    stats = merge.load_stats(index_dir)
    uniq_terms = sorted(set(phrase))
    idfs = _term_idfs(spark, index_dir, uniq_terms, stats["n_docs"])
    if len(idfs) < len(uniq_terms) or not phrase:
        return spark.createDataFrame([], RESULT_SCHEMA)
    avgdl = float(stats["avgdl"])
    excluder = _tombstone_excluder(index_dir)
    phrase_order = list(phrase)

    seg = (
        spark.read.parquet(segments_path(index_dir))
        .filter(F.col("term").isin(uniq_terms))
        .select(
            "unit", "term", "df", "postings", "positions",
            "block_last_doc", "block_max_tf", "block_min_dl", "block_offset",
        )
    )

    def score_unit(key, pdf):
        import pandas as pd

        lists = _rows_to_lists(pdf, idfs)
        by_term: dict[str, list[dict]] = {}
        for lst in lists:
            by_term.setdefault(lst["term"], []).append(lst)
        slot_lists = [by_term.get(t, []) for t in phrase_order]
        docs, scores = wand.score_proximity(
            slot_lists, avgdl, k, slop=slop, exclude=excluder(key[0])
        )
        return pd.DataFrame({"doc_id": docs, "score": scores})

    per_unit = seg.groupBy("unit").applyInPandas(score_unit, schema=RESULT_SCHEMA)
    return per_unit.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


MATCH_SCHEMA = "doc_id bigint, n_matched int"


def match_docs(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    mode: str = "or",
    min_should_match: int = 1,
) -> DataFrame:
    """Boolean match set (no scoring) -> DataFrame(doc_id, n_matched).

    The building block for facet aggregations (the reference's users get
    these from OpenSearch aggs): distributed per unit, postings decode of
    doc ids only, no driver collect."""
    terms = sorted(set(terms))
    need = len(terms) if mode == "and" else max(1, int(min_should_match))
    excluder = _tombstone_excluder(index_dir)
    seg = (
        spark.read.parquet(segments_path(index_dir))
        .filter(F.col("term").isin(terms))
        .select("unit", "term", "df", "postings")
    )

    def match_unit(key, pdf):
        import pandas as pd

        lists = [
            {"term": r.term, "df": int(r.df), "postings": r.postings}
            for r in pdf.itertuples()
        ]
        docs, counts = wand.match_doc_counts(lists, exclude=excluder(key[0]))
        keep = counts >= need
        return pd.DataFrame(
            {"doc_id": docs[keep], "n_matched": counts[keep].astype("int32")}
        )

    return seg.groupBy("unit").applyInPandas(match_unit, schema=MATCH_SCHEMA)


def search_facets(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    meta_df: DataFrame,
    facet_col: str,
    mode: str = "or",
) -> DataFrame:
    """Facet counts over the boolean match set (OpenSearch terms-aggregation
    analog): -> DataFrame(facet, doc_count), doc_count DESC, facet ASC.

    ``meta_df`` holds (doc_id, <facet_col>) metadata; the join is a
    distributed semi-join-then-aggregate — match sets never touch the
    driver. At 100-TB scale the match set is the small side (broadcast
    candidate); Catalyst/AQE picks the join strategy."""
    matched = match_docs(spark, index_dir, terms, mode=mode)
    return (
        meta_df.join(matched.select("doc_id"), "doc_id")
        .groupBy(F.col(facet_col).alias("facet"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("facet"))
    )


def search_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[dict],
    strategy: str = "maxscore",
) -> DataFrame:
    """Many queries in ONE Spark job -> DataFrame(query_id, doc_id, score).

    queries: [{query_id, terms, k}]. Segment rows for the union of all
    query terms are read once; each unit scores every query against its
    local lists; the global per-query top-k is a single window."""
    stats = merge.load_stats(index_dir)
    all_terms = sorted({t for q in queries for t in q["terms"]})
    idfs = _term_idfs(spark, index_dir, all_terms, stats["n_docs"])
    qspec = [
        {
            "query_id": int(q["query_id"]),
            "terms": sorted(set(q["terms"]) & idfs.keys()),
            "k": int(q.get("k", 10)),
        }
        for q in queries
    ]
    avgdl = float(stats["avgdl"])
    scorer = wand.STRATEGIES[strategy]
    present = sorted(idfs)
    if not present:
        return spark.createDataFrame([], BATCH_RESULT_SCHEMA)
    excluder = _tombstone_excluder(index_dir)

    seg = (
        spark.read.parquet(segments_path(index_dir))
        .filter(F.col("term").isin(present))
        .select(
            "unit", "term", "df", "postings",
            "block_last_doc", "block_max_tf", "block_min_dl", "block_offset",
        )
    )

    def score_unit_all(key, pdf):
        import pandas as pd

        exclude = excluder(key[0])
        lists = _rows_to_lists(pdf, idfs)
        by_term: dict[str, list[dict]] = {}
        for lst in lists:
            by_term.setdefault(lst["term"], []).append(lst)
        out_q, out_d, out_s = [], [], []
        for q in qspec:
            qlists = [l for t in q["terms"] for l in by_term.get(t, [])]
            if not qlists:
                continue
            docs, scores = scorer(qlists, avgdl, q["k"], exclude=exclude)
            out_q.extend([q["query_id"]] * len(docs))
            out_d.extend(docs.tolist())
            out_s.extend(scores.tolist())
        return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    per_unit = seg.groupBy("unit").applyInPandas(score_unit_all, schema=BATCH_RESULT_SCHEMA)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    kmap = {q["query_id"]: q["k"] for q in qspec}
    kdf = spark.createDataFrame(list(kmap.items()), "query_id int, k int")
    return (
        per_unit.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(kdf), "query_id")
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )
