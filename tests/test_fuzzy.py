"""Fuzzy (edit-distance) term queries: vectorized batch Levenshtein,
lexicon expansion, and expand-then-score parity with the exact scorer.

Reference shape: the OpenSearch ``fuzziness`` match option / Lucene
FuzzyQuery over the keyword subfield every text column gets in the
mapper (opensearch_mapper.go:17,44-53)."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from pgspark_index import build, merge, query


# ---- the DP itself (no Spark) ----------------------------------------------


def _lev_ref(a: str, b: str, transpositions: bool) -> int:
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
            if (
                transpositions
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[m][n]


@pytest.mark.parametrize("transpositions", [False, True])
def test_levenshtein_batch_matches_reference(transpositions):
    rng = random.Random(11)
    alph = "abc01"
    for _ in range(60):
        q = "".join(rng.choice(alph) for _ in range(rng.randint(1, 8)))
        cands = [
            "".join(rng.choice(alph) for _ in range(rng.randint(1, 10)))
            for _ in range(50)
        ]
        lens = np.array([len(c) for c in cands], dtype=np.int64)
        lmax = int(lens.max())
        cand = np.zeros((len(cands), lmax), dtype=np.uint8)
        for i, c in enumerate(cands):
            cand[i, : len(c)] = np.frombuffer(c.encode(), dtype=np.uint8)
        qb = np.frombuffer(q.encode(), dtype=np.uint8)
        got = query._levenshtein_batch(cand, lens, qb, transpositions)
        want = np.array([_lev_ref(q, c, transpositions) for c in cands])
        assert (got == want).all(), (q, transpositions)


def test_levenshtein_transposition_counts_one():
    # 'ab' -> 'ba': 2 plain edits, 1 with OSA transpositions
    cand = np.frombuffer(b"ba", dtype=np.uint8).reshape(1, 2).copy()
    lens = np.array([2], dtype=np.int64)
    qb = np.frombuffer(b"ab", dtype=np.uint8)
    assert query._levenshtein_batch(cand, lens, qb, False)[0] == 2
    assert query._levenshtein_batch(cand, lens, qb, True)[0] == 1


# ---- expansion + search over a built index ---------------------------------


@pytest.fixture(scope="module")
def corpus_pdf():
    rng = np.random.RandomState(13)
    vocab = (
        ["table", "cable", "tale", "tables", "tabled", "fable"]  # 'table'@1
        + ["stream", "streams", "scream"]
        + [f"w{i:03d}" for i in range(40)]
    )
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(8, 30)))
        for _ in range(300)
    ]
    return pd.DataFrame(
        {"doc_id": np.arange(300, dtype="int64"), "text": texts}
    )


@pytest.fixture(scope="module")
def built(spark, corpus_pdf, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("fuzzy") / "idx")
    df = spark.createDataFrame(corpus_pdf, "doc_id long, text string")
    build.build_index(spark, build.docs_unit_provider(df), idx,
                      num_units=2, partitions=4, sample_fraction=1.0)
    merge.merge_index(spark, idx)
    return idx


def _lexicon_terms(corpus_pdf) -> set[str]:
    return set(" ".join(corpus_pdf["text"]).split())


@pytest.mark.parametrize("q,max_edits", [("table", 1), ("table", 2), ("stream", 1), ("w001", 1)])
def test_expand_fuzzy_matches_bruteforce(built, corpus_pdf, q, max_edits):
    got = query.expand_fuzzy(built, q, max_edits=max_edits)
    want = sorted(
        t for t in _lexicon_terms(corpus_pdf)
        if _lev_ref(q, t, False) <= max_edits
    )
    assert got == want


def test_expand_fuzzy_includes_exact_and_zero_edits(built):
    assert "table" in query.expand_fuzzy(built, "table", max_edits=1)
    assert query.expand_fuzzy(built, "table", max_edits=0) == ["table"]
    # absent term at 0 edits -> no expansion
    assert query.expand_fuzzy(built, "zzzz", max_edits=0) == []


def test_expand_fuzzy_prefix_length(built, corpus_pdf):
    got = query.expand_fuzzy(built, "table", max_edits=1, prefix_length=2)
    want = sorted(
        t for t in _lexicon_terms(corpus_pdf)
        if t.startswith("ta") and _lev_ref("table", t, False) <= 1
    )
    assert got == want
    assert "cable" not in got and "fable" not in got


def test_expand_fuzzy_transpositions(built):
    # 'tbale' is 'table' with one transposition: 2 plain edits, 1 OSA
    plain = query.expand_fuzzy(built, "tbale", max_edits=1)
    osa = query.expand_fuzzy(built, "tbale", max_edits=1, transpositions=True)
    assert "table" not in plain
    assert "table" in osa


def test_expand_fuzzy_cap_is_lexicographic(built):
    full = query.expand_fuzzy(built, "table", max_edits=2)
    assert len(full) > 3
    with pytest.warns(UserWarning, match="truncated"):
        capped = query.expand_fuzzy(built, "table", max_edits=2, max_expansions=3)
    assert capped == full[:3]


def test_expand_fuzzy_validation(built):
    with pytest.raises(ValueError, match="empty"):
        query.expand_fuzzy(built, "")
    with pytest.raises(ValueError, match="max_edits"):
        query.expand_fuzzy(built, "table", max_edits=3)


def test_search_fuzzy_equals_expand_then_search(spark, built):
    terms = query.expand_fuzzy(built, "table", max_edits=1)
    want = [
        (r["doc_id"], round(r["score"], 6))
        for r in query.search(spark, built, terms, 10).collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in query.search_fuzzy(spark, built, "table", 10, max_edits=1).collect()
    ]
    assert got == want and len(got) == 10


def test_search_fuzzy_no_match_is_empty(spark, built):
    res = query.search_fuzzy(spark, built, "qqqqqqqq", 10, max_edits=1)
    assert res.collect() == []
