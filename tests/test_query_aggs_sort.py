"""Sort-by-field, range/cardinality/percentiles/top_hits aggregations,
decay scoring, best_fields multi-field fusion, and query-time synonym
expansion — each checked against a brute-force pandas/numpy oracle over
the same corpus.

Reference shape: all are request-body features of the OpenSearch /_search
API the reference's search store drives (sort, aggs.range / cardinality /
percentiles / top_hits, function_score.gauss, multi_match
type=best_fields, synonym analysis)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pgspark_index import bm25, build, merge, query


@pytest.fixture(scope="module")
def corpus_pdf():
    rng = np.random.RandomState(31)
    vocab = ["data", "table", "fast", "slow", "query", "scan"] + [
        f"w{i:03d}" for i in range(30)
    ]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(6, 40)))
        for _ in range(400)
    ]
    return pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype="int64"),
            "text": texts,
            "n_chars": np.array([len(t) for t in texts], dtype="int64"),
            "lang": [("en", "de", "fr")[i % 3] for i in range(400)],
        }
    )


@pytest.fixture(scope="module")
def built(spark, corpus_pdf, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("aggs") / "idx")
    df = spark.createDataFrame(
        corpus_pdf[["doc_id", "text"]], "doc_id long, text string"
    )
    build.build_index(spark, build.docs_unit_provider(df), idx,
                      num_units=2, partitions=4, sample_fraction=1.0)
    merge.merge_index(spark, idx)
    return idx


@pytest.fixture(scope="module")
def meta(spark, corpus_pdf):
    return spark.createDataFrame(
        corpus_pdf[["doc_id", "n_chars", "lang"]],
        "doc_id long, n_chars long, lang string",
    )


TERMS = ["data", "query"]


def _match_set(corpus_pdf) -> set[int]:
    out = set()
    for d, t in zip(corpus_pdf.doc_id, corpus_pdf.text):
        toks = set(t.split())
        if toks & set(TERMS):
            out.add(int(d))
    return out


def _bm25_scores(corpus_pdf, terms) -> dict[int, float]:
    """Brute-force BM25 over the whitespace corpus (idf/avgdl per
    pgspark_index.bm25 — the engine's exact math)."""
    toks = {int(d): t.split() for d, t in zip(corpus_pdf.doc_id, corpus_pdf.text)}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out: dict[int, float] = {}
    for t in set(terms):
        df = sum(1 for v in toks.values() if t in v)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(t)
            if tf:
                w = (tf * (bm25.K1 + 1.0)) / (
                    tf + bm25.K1 * (1.0 - bm25.B + bm25.B * len(v) / avgdl)
                )
                out[d] = out.get(d, 0.0) + idf * w
    return out


def test_sort_by_field(spark, built, meta, corpus_pdf):
    res = query.search_sort(
        spark, built, TERMS, meta, "n_chars", k=10, ascending=False
    ).collect()
    m = _match_set(corpus_pdf)
    want = sorted(
        ((int(r.n_chars), int(r.doc_id)) for r in
         corpus_pdf.itertuples() if int(r.doc_id) in m),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    assert [(int(r["n_chars"]), int(r["doc_id"])) for r in res] == want


def test_agg_range_overlap_and_empty(spark, built, meta, corpus_pdf):
    ranges = [
        ("short", None, 100.0),
        ("all", None, None),
        ("mid", 100.0, 200.0),
        ("huge", 100000.0, None),  # provably empty -> kept with 0
    ]
    res = {
        r["key"]: r["doc_count"]
        for r in query.search_agg_range(
            spark, built, TERMS, meta, "n_chars", ranges
        ).collect()
    }
    m = _match_set(corpus_pdf)
    vals = [int(r.n_chars) for r in corpus_pdf.itertuples() if int(r.doc_id) in m]
    assert res == {
        "short": sum(1 for v in vals if v < 100),
        "all": len(vals),
        "mid": sum(1 for v in vals if 100 <= v < 200),
        "huge": 0,
    }


def test_agg_cardinality_exact_and_approx(spark, built, meta, corpus_pdf):
    exact = query.search_agg_cardinality(
        spark, built, TERMS, meta, "lang", exact=True
    ).collect()[0]["cardinality"]
    assert exact == 3  # every lang bucket matches something at this size
    approx = query.search_agg_cardinality(
        spark, built, TERMS, meta, "lang", exact=False, rsd=0.05
    ).collect()[0]["cardinality"]
    assert abs(approx - exact) <= max(1, 0.2 * exact)


def test_agg_percentiles_linear_interpolation(spark, built, meta, corpus_pdf):
    res = query.search_agg_percentiles(
        spark, built, TERMS, meta, "n_chars", (0.25, 0.5, 0.75)
    ).collect()
    m = _match_set(corpus_pdf)
    vals = sorted(
        int(r.n_chars) for r in corpus_pdf.itertuples() if int(r.doc_id) in m
    )
    for row in res:
        want = float(np.percentile(vals, 100.0 * row["pct"],
                                   method="linear"))
        assert row["value"] == pytest.approx(want, abs=1e-6)


def test_agg_top_hits_per_bucket(spark, built, meta, corpus_pdf):
    res = query.search_agg_top_hits(
        spark, built, TERMS, meta, "lang", n=2
    ).collect()
    scores = _bm25_scores(corpus_pdf, TERMS)
    lang = {int(r.doc_id): r.lang for r in corpus_pdf.itertuples()}
    want = []
    for b in ("de", "en", "fr"):
        hits = sorted(
            ((d, s) for d, s in scores.items() if lang[d] == b),
            key=lambda x: (-x[1], x[0]),
        )[:2]
        want.extend((b, i + 1, d) for i, (d, _) in enumerate(hits))
    got = [(r["bucket"], r["rank"], r["doc_id"]) for r in res]
    assert got == want
    for r in res:
        assert r["score"] == pytest.approx(scores[r["doc_id"]], rel=1e-9)


@pytest.mark.parametrize("fn", ["gauss", "exp", "linear"])
def test_decay_matches_oracle(spark, built, meta, corpus_pdf, fn):
    origin, scale, decay = 150.0, 80.0, 0.5
    res = query.search_decay(
        spark, built, TERMS, meta, "n_chars",
        origin=origin, scale=scale, decay=decay, k=10, fn=fn,
    ).collect()
    scores = _bm25_scores(corpus_pdf, TERMS)
    nch = {int(r.doc_id): int(r.n_chars) for r in corpus_pdf.itertuples()}

    def factor(v):
        dist = max(0.0, abs(v - origin))
        if fn == "gauss":
            s2 = -(scale ** 2) / (2.0 * math.log(decay))
            return math.exp(-(dist ** 2) / (2.0 * s2))
        if fn == "exp":
            return math.exp(math.log(decay) / scale * dist)
        return max(0.0, (scale / (1 - decay) - dist) / (scale / (1 - decay)))

    want = sorted(
        ((d, s * factor(nch[d])) for d, s in scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert [r["doc_id"] for r in res] == [d for d, _ in want]
    for r, (_, s) in zip(res, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    # the decay factor is exactly `decay` at distance scale (offset 0)
    assert factor(origin + scale) == pytest.approx(decay)


def test_decay_missing_field_keeps_score(spark, built, corpus_pdf):
    # metadata covering only HALF the docs: missing docs keep factor 1.0
    half = spark.createDataFrame(
        corpus_pdf[corpus_pdf.doc_id < 200][["doc_id", "n_chars"]],
        "doc_id long, n_chars long",
    )
    res = query.search_decay(
        spark, built, TERMS, half, "n_chars",
        origin=0.0, scale=10.0, decay=0.5, k=400, fn="gauss",
    ).collect()
    scores = _bm25_scores(corpus_pdf, TERMS)
    got = {r["doc_id"]: r["score"] for r in res}
    for d, s in scores.items():
        if d >= 200:
            assert got[d] == pytest.approx(s, rel=1e-9)


def test_bestfields_vs_mostfields(spark, corpus_pdf, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bf") / "mf")
    df = spark.createDataFrame(
        corpus_pdf[["doc_id", "text"]], "doc_id long, text string"
    )
    title = F.array_join(
        F.slice(F.split(F.col("text"), " "), 1, 4), " "
    )
    fields = build.build_index_multifield(
        spark, df, root, fields={"body": F.col("text"), "title": title},
        num_units=2, partitions=4,
    )
    res = query.search_multifield_bestfields(
        spark, fields, TERMS, k=10, boosts={"title": 2.0, "body": 1.0},
        tie_breaker=0.25,
    ).collect()

    body = _bm25_scores(corpus_pdf, TERMS)
    tc = corpus_pdf.copy()
    tc["text"] = [" ".join(t.split()[:4]) for t in corpus_pdf.text]
    titles = _bm25_scores(tc, TERMS)
    fused = {}
    for d in set(body) | set(titles):
        b, t = body.get(d, 0.0), 2.0 * titles.get(d, 0.0)
        fused[d] = max(b, t) + 0.25 * (b + t - max(b, t))
    want = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [r["doc_id"] for r in res] == [d for d, _ in want]
    for r, (_, s) in zip(res, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_synonyms_group_max(spark, built, corpus_pdf):
    groups = [["data", "table"], ["fast", "slow"]]
    res = query.search_synonyms(spark, built, groups, k=10).collect()
    per_term = {t: _bm25_scores(corpus_pdf, [t]) for g in groups for t in g}
    docs = set().union(*(set(v) for v in per_term.values()))
    want_scores = {}
    for d in docs:
        total = 0.0
        for g in groups:
            total += max(per_term[t].get(d, 0.0) for t in g)
        want_scores[d] = total
    want = sorted(want_scores.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [r["doc_id"] for r in res] == [d for d, _ in want]
    for r, (_, s) in zip(res, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_synonyms_rejects_overlapping_groups(spark, built):
    with pytest.raises(ValueError):
        query.search_synonyms(spark, built, [["a", "b"], ["b", "c"]])
