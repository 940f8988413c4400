"""Positional index: phrase queries, boolean AND, metadata filters.

The capability analog is the reference's OpenSearch text fields
(match_phrase / bool-must / filtered queries,
/root/reference/internal/searchstore/opensearch/opensearch_mapper.go:17-68).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgspark_index import build, codecs, fixtures, merge, query
from pgspark_index.textnorm import fast_token_positions, tokenize, extract_text


def test_position_codec_roundtrip():
    rng = np.random.RandomState(5)
    tfs = rng.randint(1, 9, size=500).astype(np.int64)
    pos = []
    for t in tfs:
        p = np.sort(rng.choice(5000, size=t, replace=False))
        pos.append(p)
    flat = np.concatenate(pos).astype(np.int64)
    starts = np.array([0, 100, 101, 400], dtype=np.int64)  # posting-index group starts
    blobs = codecs.encode_position_groups(starts, tfs, flat)
    assert len(blobs) == 4
    # decode each group and compare against the slice
    val_starts = np.concatenate(([0], np.cumsum(tfs)))
    bounds = list(starts) + [tfs.size]
    for g in range(4):
        lo_p, hi_p = bounds[g], bounds[g + 1]
        got = codecs.decode_positions(blobs[g], tfs[lo_p:hi_p])
        want = flat[val_starts[lo_p] : val_starts[hi_p]]
        assert got.tolist() == want.tolist()


def test_fast_token_positions_consistency():
    pdf = fixtures.make_webtext_pdf(150, seed=3)
    for h, t in zip(pdf["html"], pdf["text"]):
        h = h if isinstance(h, (bytes, bytearray)) else None
        t = t if isinstance(t, str) else None
        dl, items = fast_token_positions(h, t)
        toks = tokenize(extract_text(h, t))
        assert dl == len(toks)
        for term, tf, ps in items:
            assert tf == len(ps)
            assert all(toks[p] == term for p in ps)
        assert sum(it[1] for it in items) == len(toks)


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("posidx"))
    rows = [
        (f"https://ex.com/{i}", f"alpha beta gamma delta page {i}", i)
        for i in range(40)
    ]
    rows += [
        ("https://ex.com/x1", "beta alpha separated beta then alpha", 90),
        ("https://ex.com/x2", "gamma alpha beta gamma", 91),
        ("https://ex.com/x3", "alpha beta alpha beta repeated", 92),
        ("https://ex.com/only", "zeta eta theta", 93),
    ]
    df = spark.createDataFrame(rows, "url string, text string, n int").select(
        "url",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("n")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    build.build_index(spark, df, idx, num_units=1, partitions=4,
                      sample_fraction=1.0, with_positions=True)
    merge.merge_index(spark, idx)
    return idx, df


def _brute_phrase(df, phrase):
    rows = df.select(F.xxhash64("url").alias("doc_id"), "text").collect()
    out = set()
    for r in rows:
        toks = tokenize(extract_text(None, r["text"]))
        for i in range(len(toks) - len(phrase) + 1):
            if toks[i : i + len(phrase)] == phrase:
                out.add(r["doc_id"])
                break
    return out


def test_phrase_matches_brute_force(spark, pos_index):
    idx, df = pos_index
    for phrase in (["alpha", "beta"], ["beta", "gamma"], ["alpha", "beta", "gamma"],
                   ["beta", "alpha"], ["zeta", "eta", "theta"], ["delta", "alpha"]):
        got = {r["doc_id"] for r in query.search_phrase(spark, idx, phrase, 1000).collect()}
        assert got == _brute_phrase(df, phrase), phrase


def test_conjunctive_vs_or(spark, pos_index):
    idx, df = pos_index
    hits_and = query.search(spark, idx, ["alpha", "zeta"], 1000, mode="and").collect()
    assert hits_and == []  # no doc has both
    hits_or = query.search(spark, idx, ["alpha", "zeta"], 1000).collect()
    assert len(hits_or) == 44  # 40 pages + x1..x3 have alpha; 'only' has zeta
    hits_ab = query.search(spark, idx, ["alpha", "theta"], 1000, mode="and").collect()
    assert hits_ab == []
    hits = query.search(spark, idx, ["beta", "gamma"], 1000, mode="and").collect()
    got = {r["doc_id"] for r in hits}
    want = _brute_phrase(df, ["beta"]) & _brute_phrase(df, ["gamma"])
    assert got == want


def test_filtered_search(spark, pos_index):
    idx, df = pos_index
    allowed = df.select(F.xxhash64("url").alias("doc_id")).limit(7)
    allowed_set = {r["doc_id"] for r in allowed.collect()}
    res = query.search(spark, idx, ["alpha"], 1000, filter_df=allowed).collect()
    assert {r["doc_id"] for r in res} <= allowed_set
    # filter must apply BEFORE top-k: k smaller than the allowed matches
    res2 = query.search(spark, idx, ["alpha"], 3, filter_df=allowed).collect()
    assert len(res2) == min(3, len([d for d in allowed_set]))
    assert {r["doc_id"] for r in res2} <= allowed_set


def _brute_proximity(df, phrase, slop):
    """Ordered chain: word i+1 within (p_i, p_i + 1 + slop]."""
    rows = df.select(F.xxhash64("url").alias("doc_id"), "text").collect()
    out = set()
    for r in rows:
        toks = tokenize(extract_text(None, r["text"]))
        pos = {}
        for i, t in enumerate(toks):
            pos.setdefault(t, []).append(i)
        frontier = set(pos.get(phrase[0], []))
        for w in phrase[1:]:
            nxt = set()
            for p in frontier:
                for q in pos.get(w, []):
                    if p < q <= p + 1 + slop:
                        nxt.add(q)
            frontier = nxt
            if not frontier:
                break
        if frontier:
            out.add(r["doc_id"])
    return out


def test_proximity_matches_brute_force(spark, pos_index):
    idx, df = pos_index
    for phrase, slop in (
        (["alpha", "beta"], 0),
        (["alpha", "gamma"], 1),       # alpha beta gamma -> 1 intervening
        (["beta", "alpha"], 3),        # x1: 'beta then alpha' needs slop >= 1
        (["alpha", "beta", "gamma"], 1),
        (["gamma", "beta"], 0),
        (["zeta", "theta"], 1),
    ):
        got = {
            r["doc_id"]
            for r in query.search_proximity(spark, idx, phrase, slop=slop, k=1000).collect()
        }
        assert got == _brute_proximity(df, phrase, slop), (phrase, slop)
    # slop=0 must equal the exact phrase path
    for phrase in (["alpha", "beta"], ["beta", "gamma"]):
        a = {r["doc_id"] for r in query.search_proximity(spark, idx, phrase, 0, 1000).collect()}
        b = {r["doc_id"] for r in query.search_phrase(spark, idx, phrase, 1000).collect()}
        assert a == b


def test_min_should_match(spark, pos_index):
    idx, df = pos_index
    terms = ["alpha", "beta", "zeta"]
    rows = df.select(F.xxhash64("url").alias("doc_id"), "text").collect()
    n_matched = {}
    for r in rows:
        toks = set(tokenize(extract_text(None, r["text"])))
        n_matched[r["doc_id"]] = sum(1 for t in terms if t in toks)
    for m in (1, 2, 3):
        got = {
            r["doc_id"]
            for r in query.search_min_should_match(spark, idx, terms, m, 1000).collect()
        }
        want = {d for d, c in n_matched.items() if c >= m}
        assert got == want, m
    # m = 1 == OR; m = n == AND
    or_docs = {r["doc_id"] for r in query.search(spark, idx, terms, 1000).collect()}
    assert {r["doc_id"] for r in query.search_min_should_match(spark, idx, terms, 1, 1000).collect()} == or_docs


def test_facets(spark, pos_index):
    idx, df = pos_index
    meta = df.select(
        F.xxhash64("url").alias("doc_id"),
        F.when(F.col("text").contains("page"), "page").otherwise("other").alias("kind"),
    )
    res = query.search_facets(spark, idx, ["alpha"], meta, "kind").collect()
    counts = {r["facet"]: r["doc_count"] for r in res}
    assert counts == {"page": 40, "other": 3}  # x1..x3 contain alpha, 'only' doesn't
