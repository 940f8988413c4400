"""Round-3 query features: must_not, delete-by-query, bounded filtered
search, tombstone-scale fallback, multi-field search, alias cutover.

Reference parity notes in each test; oracle comparisons use the numpy
oracle / recomputed-from-corpus expectations (the DuckDB cross-check runs
via driverapi in tools/check_oracles.py)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgspark_index import aliases, build, fixtures, incremental, merge, query


def _build(spark, tmp_index, n=1200, seed=21, **kw):
    df = fixtures.make_webtext_df(spark, n, seed=seed, partitions=4)
    build.build_index(spark, df, tmp_index, num_units=2, partitions=4,
                      sample_fraction=1.0, **kw)
    merge.merge_index(spark, tmp_index)
    return df


def _rows(df):
    return [(r["doc_id"], round(r["score"], 10)) for r in df.collect()]


# ---------------------------------------------------------------------------
# must_not (bool filter context; OpenSearch bool.must_not analog)
# ---------------------------------------------------------------------------


def test_must_not_excludes_matching_docs(spark, tmp_index):
    _build(spark, tmp_index)
    qs = fixtures.make_query_set(3, seed=7)
    terms = qs[0]["terms"]
    neg = [qs[1]["terms"][0]]

    base = query.search(spark, tmp_index, terms, 50).collect()
    got = query.search(spark, tmp_index, terms, 50, exclude_terms=neg).collect()

    # every excluded doc contains a neg term; every kept doc does not
    neg_docs = {
        r["doc_id"] for r in query.match_docs(spark, tmp_index, neg).collect()
    }
    got_ids = {r["doc_id"] for r in got}
    assert not (got_ids & neg_docs)
    # base minus neg docs must be a PREFIX of the must_not result (the
    # must_not list backfills with docs ranked past base's cutoff)
    base_kept = [
        (r["doc_id"], round(r["score"], 10)) for r in base
        if r["doc_id"] not in neg_docs
    ]
    got_kept = [(r["doc_id"], round(r["score"], 10)) for r in got]
    assert got_kept[: len(base_kept)] == base_kept
    # exclusion of a never-occurring term is a no-op
    same = query.search(
        spark, tmp_index, terms, 50, exclude_terms=["zz_absent_term"]
    ).collect()
    assert _rows_eq(same, base)


def _rows_eq(a, b):
    return [(r["doc_id"], round(r["score"], 10)) for r in a] == [
        (r["doc_id"], round(r["score"], 10)) for r in b
    ]


# ---------------------------------------------------------------------------
# delete-by-query (reference: search_store.go:154-184 DeleteByQuery)
# ---------------------------------------------------------------------------


def test_drop_docs_and_compact_expunge(spark, tmp_index):
    df = _build(spark, tmp_index)
    stats0 = merge.load_stats(tmp_index)
    qs = fixtures.make_query_set(2, seed=5)
    terms = qs[0]["terms"]

    # drop every doc matching a term query (delete-by-query over a match
    # set). Materialize the ids FIRST: match_docs is lazy and excludes
    # tombstones, so re-evaluating it after the drop would see nothing.
    dropped = sorted(
        r["doc_id"]
        for r in query.match_docs(spark, tmp_index, [terms[0]]).collect()
    )
    n_match = len(dropped)
    assert n_match > 0
    mdf = spark.createDataFrame([(i,) for i in dropped], "doc_id bigint")
    res = incremental.drop_docs(spark, tmp_index, mdf)
    assert res["tombstoned"] == n_match

    # queries exclude them immediately; stats are corrected
    got = query.search(spark, tmp_index, terms, 30).collect()
    assert not ({r["doc_id"] for r in got} & set(dropped))
    stats1 = merge.load_stats(tmp_index)
    assert stats1["n_docs"] == stats0["n_docs"] - n_match

    # dropping the same set again changes nothing observable (the docs are
    # still physically present until compact, so they re-tombstone)
    res2 = incremental.drop_docs(spark, tmp_index, mdf)
    assert res2["tombstoned"] == n_match
    assert merge.load_stats(tmp_index)["n_docs"] == stats1["n_docs"]

    # compact physically expunges: doc rows gone, posting lists shrink,
    # stats unchanged vs the tombstone-corrected view
    out = incremental.compact(spark, tmp_index)
    assert out["removed_docs"] == n_match
    docs_left = spark.read.parquet(
        os.path.join(tmp_index, "docs")
    ).select("doc_id").collect()
    assert not ({r["doc_id"] for r in docs_left} & set(dropped))
    stats2 = merge.load_stats(tmp_index)
    assert stats2["n_docs"] == stats1["n_docs"]
    assert "tombstoned_docs" not in stats2
    got2 = query.search(spark, tmp_index, terms, 30).collect()
    assert _rows_eq(got2, got)


# ---------------------------------------------------------------------------
# bounded filtered search (filter context BEFORE scoring)
# ---------------------------------------------------------------------------


def test_filtered_search_bounded_emission(spark, tmp_index):
    """Selective filter: the include tier runs (filter applied INSIDE the
    scorers, per-unit emission <= k — round 2 emitted unit_k = n_docs),
    and all three tiers return the post-hoc-filter-exact answer."""
    _build(spark, tmp_index)
    docs = spark.read.parquet(os.path.join(tmp_index, "docs"))
    # a selective filter: ~10% of docs
    flt = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).select("doc_id")
    qs = fixtures.make_query_set(2, seed=31)
    terms = qs[0]["terms"]
    k = 7

    got = query.search(spark, tmp_index, terms, k, filter_df=flt)
    res = _rows(got)
    assert query._LAST_FILTER_MODE == "include"

    # correctness vs post-hoc filtering of a full (unfiltered, large-k) run
    full = query.search(spark, tmp_index, terms, 100_000).collect()
    flt_ids = {r["doc_id"] for r in flt.collect()}
    exp = [
        (r["doc_id"], round(r["score"], 10)) for r in full if r["doc_id"] in flt_ids
    ][:k]
    assert res == exp

    # per-unit emission bound: the include-path scorer itself returns <= k
    # rows however many docs pass the filter (wand level — this is what
    # each unit task emits before the global TakeOrdered)
    import numpy as np

    from pgspark_index import wand
    from pgspark_index.build import segments_path

    seg_pdf = (
        spark.read.parquet(segments_path(tmp_index))
        .filter(F.col("term").isin(list(terms)))
        .toPandas()
    )
    stats = merge.load_stats(tmp_index)
    idfs = query._term_idfs(spark, tmp_index, sorted(set(terms)), stats["n_docs"])
    include = np.unique(np.fromiter(flt_ids, dtype=np.int64))
    for unit in sorted(seg_pdf["unit"].unique()):
        sub = seg_pdf[seg_pdf["unit"] == unit]
        sc = query._sidecar(tmp_index, int(unit))
        inc = sc.ords_of_docs(include)
        d, s = wand.score_maxscore(
            query._rows_to_lists(sub, idfs), float(stats["avgdl"]), k, sc,
            include=inc if inc is not None else np.zeros(0, dtype=np.int64),
        )
        assert d.size <= k

    # huge-filter path (complement small): filter keeps all but a few docs
    keep_most = docs.filter(F.pmod(F.col("doc_id"), F.lit(400)) != 0).select("doc_id")
    got2 = query.search(
        spark, tmp_index, terms, k, filter_df=keep_most, filter_broadcast_limit=50
    )
    r2 = _rows(got2)
    assert query._LAST_FILTER_MODE == "exclude-complement"
    keep_ids = {r["doc_id"] for r in keep_most.collect()}
    exp2 = [
        (r["doc_id"], round(r["score"], 10)) for r in full if r["doc_id"] in keep_ids
    ][:k]
    assert r2 == exp2

    # mid-selectivity with a tiny broadcast limit -> escalating two-phase
    half = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0).select("doc_id")
    got3 = query.search(
        spark, tmp_index, terms, k, filter_df=half, filter_broadcast_limit=10
    )
    r3 = _rows(got3)
    assert query._LAST_FILTER_MODE == "escalate"
    half_ids = {r["doc_id"] for r in half.collect()}
    exp3 = [
        (r["doc_id"], round(r["score"], 10)) for r in full if r["doc_id"] in half_ids
    ][:k]
    assert r3 == exp3


# ---------------------------------------------------------------------------
# tombstone-scale fallback (closure array vs distributed anti-join)
# ---------------------------------------------------------------------------


def test_tombstone_fallback_paths_identical(spark, tmp_index):
    """Above the closure limit the excluder switches to a distributed
    anti-join; both paths must return identical results. The limit is
    forced low so the fallback triggers at test scale; a second run uses
    >=1e5 real tombstones."""
    import datetime as dt

    _build(spark, tmp_index, n=1500, seed=13)
    # recrawl 400 urls -> tombstones via build_delta
    upd = fixtures.make_webtext_pdf(1500, seed=13).drop_duplicates(
        subset=["url"], keep="last").head(400).copy()
    upd["text"] = "fallbacksentinel fresh " * 4
    upd["html"] = None
    upd["warc_ts"] = upd["warc_ts"] + dt.timedelta(days=3)
    delta = spark.createDataFrame(upd, schema=fixtures.WEBTEXT_DDL)
    incremental.build_delta(spark, delta, tmp_index, input_snapshot_id=1,
                            num_units=1, partitions=4, sample_fraction=1.0)

    qs = fixtures.make_query_set(3, seed=77)
    for q in qs:
        a = query.search(spark, tmp_index, q["terms"], q["k"])
        b = query.search(
            spark, tmp_index, q["terms"], q["k"], tombstone_closure_limit=10
        )
        assert _rows_eq(a.collect(), b.collect()), q["query_id"]


def test_tombstone_fallback_100k(spark, tmp_index):
    """>=1e5 tombstone rows: closure path and anti-join path agree (VERDICT
    round-2 ask). The 100k-row tombstone set is written directly (a huge
    delta's worth: most ids reference docs not in this index — legal, and
    exactly what a 10^12-scale delta's tombstone files look like from one
    index's perspective); ~half the real docs are tombstoned too."""
    _build(spark, tmp_index, n=2000, seed=17)
    docs = spark.read.parquet(os.path.join(tmp_index, "docs")).select("doc_id")
    real = sorted(r["doc_id"] for r in docs.collect())
    tombed = set(real[::2])  # every other real doc superseded
    pad = spark.range(100_000).select(
        F.xxhash64((F.col("id") + 999).cast("string")).alias("doc_id"),
        F.lit(1).cast("long").alias("snapshot"),
    )
    real_t = spark.createDataFrame(
        [(i, 1) for i in tombed], "doc_id bigint, snapshot bigint"
    )
    tdir = os.path.join(tmp_index, "tombstones", "snapshot-1")
    real_t.unionByName(pad).write.mode("overwrite").parquet(tdir)
    merge.merge_index(spark, tmp_index)
    assert spark.read.parquet(tdir).count() >= 100_000

    qs = fixtures.make_query_set(2, seed=3)
    for q in qs:
        a = query.search(spark, tmp_index, q["terms"], q["k"])  # closure path
        b = query.search(  # forced distributed anti-join path
            spark, tmp_index, q["terms"], q["k"], tombstone_closure_limit=100
        )
        ra, rb = a.collect(), b.collect()
        assert _rows_eq(ra, rb), q["query_id"]
        assert not ({r["doc_id"] for r in ra} & tombed)


# ---------------------------------------------------------------------------
# multi-field search (per-column mappings, search_pg_mapper.go:137-183)
# ---------------------------------------------------------------------------


def test_multifield_matches_recomputed_sum(spark, tmp_index):
    """score = boost_title * BM25_title + boost_body * BM25_body, each
    field with its own df/doclen/avgdl — verified against independent
    single-field searches summed doc-wise."""
    import shutil
    import tempfile

    import pandas as pd

    rng = np.random.RandomState(41)
    words = [f"w{i:05d}" for i in range(60)]
    texts = [
        " ".join(rng.choice(words, size=rng.randint(6, 40)))
        for _ in range(600)
    ]
    pdf = pd.DataFrame({"doc_id": np.arange(600, dtype="int64"), "text": texts})
    docs_df = spark.createDataFrame(pdf, "doc_id long, text string")
    # derived title field = first 5 tokens (clean lowercase corpus, so the
    # split equals the engine tokenizer's output)
    title_df = docs_df.select(
        "doc_id", F.array_join(F.slice(F.split("text", " "), 1, 5), " ").alias("text")
    )

    body_dir = tmp_index
    build.build_index(spark, build.docs_unit_provider(docs_df), body_dir,
                      num_units=2, partitions=4, sample_fraction=1.0)
    merge.merge_index(spark, body_dir)

    title_dir = tempfile.mkdtemp(prefix="pgspark_mf_title_")
    try:
        build.build_index(spark, build.docs_unit_provider(title_df), title_dir,
                          num_units=2, partitions=4, sample_fraction=1.0)
        merge.merge_index(spark, title_dir)

        terms = ["w00001", "w00002", "w00010"]
        boosts = {"title": 2.0, "body": 1.0}
        got = query.search_multifield(
            spark, {"body": body_dir, "title": title_dir}, terms, 15, boosts
        ).collect()
        assert got, "multifield search returned nothing"

        # expectation: per-field exhaustive scores over ALL docs, summed
        big = 10**6
        b = {r["doc_id"]: r["score"]
             for r in query.search(spark, body_dir, terms, big).collect()}
        t = {r["doc_id"]: r["score"]
             for r in query.search(spark, title_dir, terms, big).collect()}
        allsc = {}
        for d, s in b.items():
            allsc[d] = allsc.get(d, 0.0) + boosts["body"] * s
        for d, s in t.items():
            allsc[d] = allsc.get(d, 0.0) + boosts["title"] * s
        exp = sorted(allsc.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
        got_rows = [(r["doc_id"], round(r["score"], 8)) for r in got]
        exp_rows = [(d, round(s, 8)) for d, s in exp]
        assert got_rows == exp_rows
    finally:
        shutil.rmtree(title_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# alias cutover (search_index_name.go:29-66)
# ---------------------------------------------------------------------------


def test_alias_cutover(spark, tmp_index):
    base = tmp_index
    name = "webtext"

    v1 = aliases.new_version(base, name)
    df1 = fixtures.make_webtext_df(spark, 400, seed=51, partitions=2)
    build.build_index(spark, df1, v1, num_units=1, partitions=2,
                      sample_fraction=1.0)
    # publishing an unmerged (incomplete) index is refused
    with pytest.raises(ValueError):
        aliases.publish(base, name, v1)
    merge.merge_index(spark, v1)
    aliases.publish(base, name, v1)
    assert aliases.resolve(base, name) == os.path.join(base, f"{name}-v1")

    q = fixtures.make_query_set(1, seed=9)[0]
    r1 = query.search(spark, aliases.resolve(base, name), q["terms"], q["k"]).collect()

    # build v2 alongside (different corpus) — readers still see v1
    v2 = aliases.new_version(base, name)
    df2 = fixtures.make_webtext_df(spark, 600, seed=52, partitions=2)
    build.build_index(spark, df2, v2, num_units=1, partitions=2,
                      sample_fraction=1.0)
    merge.merge_index(spark, v2)
    assert aliases.resolve(base, name).endswith("-v1")

    aliases.publish(base, name, v2)  # atomic swap
    assert aliases.resolve(base, name).endswith("-v2")
    r2 = query.search(spark, aliases.resolve(base, name), q["terms"], q["k"]).collect()
    assert {r["doc_id"] for r in r2} != {r["doc_id"] for r in r1}

    # the live version cannot be dropped; the old one can
    with pytest.raises(ValueError):
        aliases.drop_version(base, name, 2)
    aliases.drop_version(base, name, 1)
    assert aliases.versions(base, name) == [2]
    # v2 still queryable after v1 removal
    assert query.search(
        spark, aliases.resolve(base, name), q["terms"], q["k"]
    ).count() == len(r2)
