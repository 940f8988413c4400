"""Prefix/wildcard expansion queries + hybrid BM25+vector fusion.

Reference shapes: the keyword subfield every text column gets in the
mapper (opensearch_mapper.go:17,44-53) serves prefix/wildcard queries;
vector(N) columns map to knn_vector fields in the SAME document
(search_pg_mapper.go:166-176,256-269), enabling combined text+knn
retrieval."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pgspark_index import build, hybrid, merge, oracle, query


@pytest.fixture(scope="module")
def corpus_pdf():
    rng = np.random.RandomState(7)
    vocab = (
        [f"app{c}" for c in "abcde"]          # prefix 'app' cluster
        + ["apple", "apply", "applied"]
        + [f"w{i:03d}" for i in range(40)]
        + ["fast", "fist", "feast", "first"]  # wildcard f?st -> fast, fist
    )
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(8, 30)))
        for _ in range(300)
    ]
    return pd.DataFrame({"doc_id": np.arange(300, dtype="int64"), "text": texts})


@pytest.fixture(scope="module")
def built(spark, corpus_pdf, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("pfx") / "idx")
    df = spark.createDataFrame(corpus_pdf, "doc_id long, text string")
    build.build_index(spark, build.docs_unit_provider(df), idx,
                      num_units=2, partitions=4, sample_fraction=1.0)
    merge.merge_index(spark, idx)
    return idx


def test_expand_prefix_matches_vocab(built, corpus_pdf):
    got = query.expand_prefix(built, "app")
    want = sorted(
        t
        for t in set(" ".join(corpus_pdf["text"]).split())
        if t.startswith("app")
    )
    assert got == want


def test_expand_prefix_cap_is_lexicographic(built):
    capped = query.expand_prefix(built, "app", max_expansions=3)
    assert capped == query.expand_prefix(built, "app")[:3]


def test_expand_wildcard(built, corpus_pdf):
    got = query.expand_wildcard(built, "f?st")
    vocab = set(" ".join(corpus_pdf["text"]).split())
    want = sorted(t for t in vocab if len(t) == 4 and t[0] == "f" and t[2:] == "st")
    assert got == want  # fast, fist — NOT feast/first


def test_search_prefix_equals_expanded_or_query(spark, built):
    exp = query.expand_prefix(built, "app")
    a = query.search_prefix(spark, built, "app", k=15).collect()
    b = query.search(spark, built, exp, 15).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
    assert len(a) > 0


def test_search_wildcard_no_match_is_empty(spark, built):
    out = query.search_wildcard(spark, built, "zzz*", k=5)
    assert out.collect() == []


def test_hybrid_rrf_matches_numpy_oracle(spark, built, corpus_pdf):
    rng = np.random.RandomState(11)
    emb = rng.randn(300, 8).astype("float64")
    emb_pdf = pd.DataFrame(
        {"vec_id": np.arange(300, dtype="int64"), "embedding": list(emb)}
    )
    emb_df = spark.createDataFrame(emb_pdf, "vec_id long, embedding array<double>")
    qv = [float(x) for x in emb[0]]
    terms = ["apple", "fast", "w003"]
    C, K = 25, 10

    got = hybrid.hybrid_topk(
        spark, built, emb_df, terms, qv, k=K, candidates=C, exclude_id=0
    ).collect()

    # numpy oracle: bm25 side from the brute-force oracle, cosine by hand
    st = oracle.build_stats(
        corpus_pdf.rename(columns={"text": "norm_text"})[["doc_id", "norm_text"]]
    )
    t_rows = oracle.score_query(st, terms, k=C)  # [(rank, doc_id, raw score)]
    t_rank = {
        int(d): i + 1
        for i, (d, s) in enumerate(
            sorted(
                ((d, round(s, 4)) for _, d, s in t_rows),
                key=lambda x: (-x[1], x[0]),
            )
        )
    }
    cos = emb @ qv / (np.linalg.norm(emb, axis=1) * np.linalg.norm(qv))
    cos = np.round(cos, 4)
    order = sorted((i for i in range(300) if i != 0), key=lambda i: (-cos[i], i))[:C]
    v_rank = {int(d): i + 1 for i, d in enumerate(order)}
    fused = {}
    for d in set(t_rank) | set(v_rank):
        f = 0.0
        if d in t_rank:
            f += 1.0 / (60 + t_rank[d])
        if d in v_rank:
            f += 1.0 / (60 + v_rank[d])
        fused[d] = round(f, 6)
    want = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:K]
    assert [(r["doc_id"], r["score"]) for r in got] == want


def test_hybrid_linear_bounds(spark, built):
    rng = np.random.RandomState(12)
    emb = rng.randn(300, 8).astype("float64")
    emb_pdf = pd.DataFrame(
        {"vec_id": np.arange(300, dtype="int64"), "embedding": list(emb)}
    )
    emb_df = spark.createDataFrame(emb_pdf, "vec_id long, embedding array<double>")
    out = hybrid.hybrid_topk(
        spark, built, emb_df, ["apple"], [float(x) for x in emb[1]],
        k=10, candidates=20, method="linear", w_text=1.0, w_vec=1.0,
    ).collect()
    assert len(out) == 10
    # linear fusion with unit weights is bounded by norm(text)+norm(cos) <= 2
    assert all(-1.0 <= r["score"] <= 2.0 for r in out)
    # descending, doc_id tie-break
    pairs = [(r["score"], r["doc_id"]) for r in out]
    assert pairs == sorted(pairs, key=lambda x: (-x[0], x[1]))
