"""Multi-field query parity: prefix / wildcard / phrase / proximity over
the multi-field root (round-5 task — root-resolution beyond plain terms).

Oracle strategy: brute-force python BM25 over the same corpus per field,
fused exactly as documented (sum for expansion queries, max/best_fields
for phrase)."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pgspark_index import build, query

DOCS = [
    "quick table hash join structure",
    "query planner quota table",
    "hash table of the quorum",
    "fast queue quick quack",
    "plain text with no matches table hash",
    "quick brown fox table",
]
# title field = first 3 tokens
TITLES = [" ".join(d.split()[:3]) for d in DOCS]
BOOSTS = {"body": 1.0, "title": 2.0}


def _bm25(field_docs, terms, doc_ids=None):
    """per-doc BM25 sum over `terms` for one field (k1=1.2, b=0.75)."""
    toks = [d.split() for d in field_docs]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    out = {}
    for t in set(terms):
        df = sum(1 for d in toks if t in d)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, d in enumerate(toks):
            tf = d.count(t)
            if not tf:
                continue
            w = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(d) / avgdl))
            out[i] = out.get(i, 0.0) + w
    return out


@pytest.fixture(scope="module")
def mf_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mfq") / "root")
    pdf = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    docs = spark.createDataFrame(pdf, "doc_id long, text string")
    title = F.array_join(F.slice(F.split("text", " "), 1, 3), " ")
    build.build_index_multifield(
        spark, docs, root,
        fields={"body": F.col("text"), "title": title},
        num_units=1, partitions=2, with_positions=True,
    )
    return root


def _expected_expansion(terms, k=10):
    body = _bm25(DOCS, terms)
    title = _bm25(TITLES, terms)
    fused = {
        i: BOOSTS["body"] * body.get(i, 0.0) + BOOSTS["title"] * title.get(i, 0.0)
        for i in set(body) | set(title)
    }
    ranked = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i, round(s, 6)) for i, s in ranked]


def _got(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def test_multifield_prefix(spark, mf_root):
    got = _got(query.search_multifield_prefix(spark, mf_root, "qu", boosts=BOOSTS))
    exp_terms = sorted(
        {w for d in DOCS for w in d.split() if w.startswith("qu")}
    )
    assert got == _expected_expansion(exp_terms)


def test_multifield_wildcard(spark, mf_root):
    got = _got(
        query.search_multifield_wildcard(spark, mf_root, "qu?ck", boosts=BOOSTS)
    )
    assert got == _expected_expansion(["quick", "quack"])


def test_multifield_regexp(spark, mf_root):
    got = _got(
        query.search_multifield_regexp(spark, mf_root, "qu[ai]ck", boosts=BOOSTS)
    )
    assert got == _expected_expansion(["quick", "quack"])


def test_multifield_phrase_best_fields(spark, mf_root):
    got = _got(
        query.search_multifield_phrase(
            spark, mf_root, ["table", "hash"], boosts=BOOSTS
        )
    )
    # phrase "table hash" occurs in: body of docs 0 and 4; title of doc 0
    # ("quick table hash"); NOT doc 2 ("hash table" reversed)
    body = _bm25(DOCS, ["table", "hash"])
    title = _bm25(TITLES, ["table", "hash"])
    fused = {}
    for i in (0, 4):
        fused[i] = max(fused.get(i, 0.0), BOOSTS["body"] * body[i])
    fused[0] = max(fused[0], BOOSTS["title"] * title[0])
    exp = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == [(i, round(s, 6)) for i, s in exp]


def test_multifield_proximity_slop(spark, mf_root):
    # slop=1 additionally admits "hash ? table"? no — ordered window:
    # table then hash within 1 intervening token. doc 2 is "hash table"
    # (reversed, still no match); doc 1 has neither adjacency.
    got = _got(
        query.search_multifield_phrase(
            spark, mf_root, ["table", "hash"], boosts=BOOSTS, slop=1
        )
    )
    assert {i for i, _ in got} == {0, 4}


def test_multifield_empty_expansion(spark, mf_root):
    assert query.search_multifield_prefix(spark, mf_root, "zzz").count() == 0


def test_multifield_phrase_prefix_best_fields(spark, mf_root):
    # "quick t*": only doc 0 matches in both fields (body "quick table…",
    # title "quick table hash"). Per-field scoring covers the exact word
    # plus every prefix expansion of that FIELD's lexicon present in the
    # doc; fusion is best_fields/max like multifield phrase.
    got = _got(
        query.search_multifield_phrase_prefix(
            spark, mf_root, ["quick", "t"], boosts=BOOSTS
        )
    )
    body_t = sorted({w for d in DOCS for w in d.split() if w.startswith("t")})
    title_t = sorted({w for t in TITLES for w in t.split() if w.startswith("t")})
    body = _bm25(DOCS, ["quick"] + body_t)
    title = _bm25(TITLES, ["quick"] + title_t)
    fused = {0: max(BOOSTS["body"] * body[0], BOOSTS["title"] * title[0])}
    exp = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == [(i, round(s, 6)) for i, s in exp]
