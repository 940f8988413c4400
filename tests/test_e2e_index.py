"""End-to-end: build -> merge -> query on the deterministic webtext corpus,
rank- and score-identical to the numpy brute-force oracle.

The oracle path is fully independent of Spark: it reuses only the pinned
textnorm stage (as the golden-producing reference must) and computes BM25
by brute force. Last-writer-wins recrawl semantics are applied to the
pandas copy the same way the engine's window does."""

import numpy as np
import pandas as pd
import pytest

from pgspark_index import build, fixtures, merge, oracle, query, textnorm

N_DOCS = 1500
SEED = 42


def oracle_docs(pdf: pd.DataFrame, spark) -> pd.DataFrame:
    """Independent last-writer-wins + extract, with engine doc_ids
    (xxhash64 comes from Spark — identity only, no scoring influence)."""
    pdf = pdf.copy()
    pdf["norm_text"] = [
        textnorm.extract_text(h, t) for h, t in zip(pdf["html"], pdf["text"])
    ]
    pdf["has_text"] = ~pdf["text"].isna()
    pdf = (
        pdf.sort_values(["url", "warc_ts", "has_text"], kind="mergesort")
        .groupby("url", as_index=False)
        .last()
    )
    from pyspark.sql import functions as F

    ids = (
        spark.createDataFrame(pdf[["url"]])
        .select("url", F.xxhash64("url").alias("doc_id"))
        .toPandas()
    )
    return pdf.merge(ids, on="url")[["doc_id", "norm_text"]]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index"))
    pdf = fixtures.make_webtext_pdf(N_DOCS, seed=SEED)
    df = fixtures.make_webtext_df(spark, N_DOCS, seed=SEED, partitions=8)
    res = build.build_index(
        spark, df, index_dir, num_units=3, partitions=8,
        salt_target=500, sample_fraction=1.0, max_fanout=4,
    )
    stats = merge.merge_index(spark, index_dir)
    ostats = oracle.build_stats(oracle_docs(pdf, spark))
    return index_dir, stats, ostats


def test_global_stats_match(built):
    _, stats, ostats = built
    assert stats["n_docs"] == ostats["N"]
    assert stats["avgdl"] == pytest.approx(ostats["avgdl"], rel=1e-12)


@pytest.mark.parametrize("strategy", ["exhaustive", "maxscore", "bmw"])
def test_queries_match_oracle(built, spark, strategy):
    index_dir, _, ostats = built
    queries = fixtures.make_query_set(25, seed=123)
    for q in queries:
        golden = oracle.score_query(ostats, q["terms"], q["k"])
        got = (
            query.search(spark, index_dir, q["terms"], q["k"], strategy=strategy)
            .collect()
        )
        got_triples = [(i + 1, r["doc_id"], r["score"]) for i, r in enumerate(got)]
        assert [t[1] for t in got_triples] == [g[1] for g in golden], (
            strategy, q,
        )
        np.testing.assert_allclose(
            [t[2] for t in got_triples], [g[2] for g in golden], rtol=0, atol=0,
        )


def test_committed_goldens(built, spark):
    """Golden (rank, doc_id, score) triples committed to the repo — guards
    against silent co-drift of engine + oracle (FIXTURES.md §3). Scores are
    stored as repr() for full float64 round-trip."""
    import json
    import pathlib

    index_dir, _, ostats = built
    queries = fixtures.make_query_set(10, seed=123)
    current = {
        str(q["query_id"]): [
            [r, d, repr(s)] for r, d, s in oracle.score_query(ostats, q["terms"], q["k"])
        ]
        for q in queries
    }
    path = pathlib.Path(__file__).parent / "golden" / "queries_n1500_seed42.json"
    if not path.exists():
        path.write_text(json.dumps(current, indent=1))
    golden = json.loads(path.read_text())
    assert current == golden, "oracle drifted from committed goldens"
    # and the engine reproduces them through Spark
    for q in queries[:5]:
        got = query.search(spark, index_dir, q["terms"], q["k"]).collect()
        exp = golden[str(q["query_id"])]
        assert [[i + 1, r["doc_id"], repr(r["score"])] for i, r in enumerate(got)] == exp


def test_batch_queries_match_single(built, spark):
    index_dir, _, ostats = built
    queries = fixtures.make_query_set(10, seed=321)
    batch = (
        query.search_batch(spark, index_dir, queries)
        .orderBy("query_id", "rank")
        .collect()
    )
    by_q: dict[int, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for q in queries:
        golden = oracle.score_query(ostats, q["terms"], q["k"])
        assert by_q.get(q["query_id"], []) == golden, q
