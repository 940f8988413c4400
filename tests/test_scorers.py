"""Property tests: exhaustive == maxscore == bmw == numpy oracle, exact.

Random corpora + queries (seeded); salted lists (a term split across
several disjoint lists) are exercised too. Mirrors the reference's
property-test layer (wal_batch_bytes_tuner_property_test.go)."""

import numpy as np
import pandas as pd
import pytest

from pgspark_index import bm25, codecs, oracle, wand


def make_lists(stats, terms, salt_fanout=1):
    """Build encoded list dicts from oracle stats (optionally salted)."""
    n = stats["N"]
    lists = []
    for term in sorted(set(terms)):
        postings = stats["tf"].get(term)
        if not postings:
            continue
        idf = float(bm25.idf(n, len(postings)))
        items = sorted(postings.items())
        doc_ids = np.array([d for d, _ in items], dtype=np.int64)
        tfs = np.array([t for _, t in items], dtype=np.int64)
        dls = np.array([stats["doclen"][d] for d, _ in items], dtype=np.int64)
        fan = salt_fanout if len(items) > 8 else 1
        for s in range(fan):
            mask = (doc_ids % fan) == s if fan > 1 else np.ones(doc_ids.size, bool)
            if not mask.any():
                continue
            enc = codecs.encode_postings(doc_ids[mask], tfs[mask], dls[mask])
            lists.append(
                {
                    "term": term,
                    "idf": idf,
                    "df": enc["df"],
                    "postings": enc["postings"],
                    "block_last_doc": enc["block_last_doc"],
                    "block_max_tf": enc["block_max_tf"],
                    "block_min_dl": enc["block_min_dl"],
                    "block_offset": enc["block_offset"],
                }
            )
    return lists


def make_dl_of(stats):
    """dl gather over the oracle's doclen map — the docs-table sidecar
    lookup the engine builds per unit (format v2: doclen not in stream)."""
    docs = np.array(sorted(stats["doclen"]), dtype=np.int64)
    dls = np.array([stats["doclen"][int(d)] for d in docs], dtype=np.int64)

    def dl_of(x):
        if x.size == 0:
            return np.zeros(0, dtype=np.int64)
        return dls[np.searchsorted(docs, x)]

    return dl_of


def rand_corpus(seed, n_docs=400, vocab=40):
    rng = np.random.RandomState(seed)
    words = [f"t{i}" for i in range(vocab)]
    probs = np.arange(1, vocab + 1, dtype=float) ** -1.2
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(words, size=rng.randint(3, 60), p=probs))
        for _ in range(n_docs)
    ]
    # doc keys are non-negative ordinals in format v3
    doc_ids = rng.randint(0, 2**62, size=n_docs).astype(np.int64)
    doc_ids = np.unique(doc_ids)[:n_docs]
    return pd.DataFrame({"doc_id": doc_ids[: len(texts)], "norm_text": texts[: len(doc_ids)]})


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("salt", [1, 4])
def test_strategies_match_oracle(seed, salt):
    docs = rand_corpus(seed)
    stats = oracle.build_stats(docs)
    rng = np.random.RandomState(seed + 100)
    vocab = sorted(stats["df"])
    for qi in range(12):
        nterms = rng.randint(1, 5)
        terms = list(rng.choice(vocab, size=nterms, replace=False))
        if qi % 4 == 0:
            terms.append("absent_term")
        k = int(rng.choice([1, 3, 10, 25]))
        golden = oracle.score_query(stats, terms, k)
        lists = make_lists(stats, terms, salt_fanout=salt)
        sc = wand.SimpleSidecar(make_dl_of(stats))
        for name, scorer in wand.STRATEGIES.items():
            got_docs, got_scores = scorer(lists, stats["avgdl"], k, sc)
            exp_docs = [d for _, d, _ in golden]
            exp_scores = [s for _, _, s in golden]
            assert got_docs.tolist() == exp_docs, (name, terms, k)
            np.testing.assert_array_equal(got_scores, np.array(exp_scores), err_msg=name)


def test_empty_and_missing():
    sc = wand.SimpleSidecar(lambda x: np.zeros(x.size, dtype=np.int64))
    for scorer in wand.STRATEGIES.values():
        d, s = scorer([], 10.0, 5, sc)
        assert d.size == 0 and s.size == 0


def test_tie_break_doc_id_asc():
    # identical docs -> identical scores -> ranked by doc key ascending
    docs = pd.DataFrame(
        {"doc_id": [5, 3, 9, 1], "norm_text": ["a b", "a b", "a b", "a b"]}
    )
    stats = oracle.build_stats(docs)
    golden = oracle.score_query(stats, ["a"], 3)
    assert [d for _, d, _ in golden] == [1, 3, 5]
    lists = make_lists(stats, ["a"])
    sc = wand.SimpleSidecar(make_dl_of(stats))
    for name, scorer in wand.STRATEGIES.items():
        got_docs, _ = scorer(lists, stats["avgdl"], 3, sc)
        assert got_docs.tolist() == [1, 3, 5], name


def test_ranged_search_matches_standard(spark, tmp_index):
    """Doc-range-parallel scoring is bit-exact with the per-unit path for
    every range count, including after a delta introduces tombstones."""
    from pgspark_index import build, fixtures, incremental, merge, query

    df = fixtures.make_webtext_df(spark, 1500, seed=11, partitions=4)
    build.build_index(spark, df, tmp_index, num_units=2, partitions=4,
                      sample_fraction=1.0)
    merge.merge_index(spark, tmp_index)

    qs = fixtures.make_query_set(4, seed=99)
    for q in qs:
        a = [(r["doc_id"], round(r["score"], 10))
             for r in query.search(spark, tmp_index, q["terms"], q["k"]).collect()]
        for R in (2, 8):
            b = [(r["doc_id"], round(r["score"], 10))
                 for r in query.search_ranged(spark, tmp_index, q["terms"],
                                              q["k"], ranges=R).collect()]
            assert a == b, (q["query_id"], R)

    # delta: recrawl 30 urls -> tombstones; both paths must exclude them
    import datetime as dt

    upd = fixtures.make_webtext_pdf(1500, seed=11).drop_duplicates(
        subset=["url"], keep="last").head(30).copy()
    upd["text"] = "rangedsentinel fresh " * 5
    upd["html"] = None
    upd["warc_ts"] = upd["warc_ts"] + dt.timedelta(days=5)
    delta = spark.createDataFrame(upd, schema=fixtures.WEBTEXT_DDL)
    incremental.build_delta(spark, delta, tmp_index, input_snapshot_id=1,
                            num_units=1, partitions=4, sample_fraction=1.0)
    for q in qs:
        a = [(r["doc_id"], round(r["score"], 10))
             for r in query.search(spark, tmp_index, q["terms"], q["k"]).collect()]
        b = [(r["doc_id"], round(r["score"], 10))
             for r in query.search_ranged(spark, tmp_index, q["terms"],
                                          q["k"], ranges=4).collect()]
        assert a == b, q["query_id"]


def test_bmw_tie_nonmonotone_ordinals():
    """Regression (ADVICE r3): v3 traverses in ORDINAL order while ties
    break on the mapped doc_id. With identical docs every block upper
    bound EQUALS the exact score, so pruning on ub == T would skip the
    later ordinals whose smaller mapped doc_ids must win the tie."""
    n = 40
    docs = pd.DataFrame({"doc_id": list(range(n)), "norm_text": ["a b"] * n})
    stats = oracle.build_stats(docs)
    lists = make_lists(stats, ["a", "b"])
    # ordinal o -> doc_id (n-1-o)*7 + 3: ordinal order is the REVERSE of
    # doc_id order, so the first-k-traversed docs are the WRONG answer
    mapped = np.array([(n - 1 - o) * 7 + 3 for o in range(n)], dtype=np.int64)
    sc = wand.SimpleSidecar(make_dl_of(stats), doc_of=lambda o: mapped[o])
    k = 5
    exp_docs, exp_scores = wand.score_exhaustive(lists, stats["avgdl"], k, sc)
    assert exp_docs.tolist() == [3, 10, 17, 24, 31]
    for name in ("maxscore", "bmw"):
        got_docs, got_scores = wand.STRATEGIES[name](lists, stats["avgdl"], k, sc)
        assert got_docs.tolist() == exp_docs.tolist(), name
        np.testing.assert_array_equal(got_scores, exp_scores, err_msg=name)
