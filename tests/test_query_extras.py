"""search_after pagination, regexp term queries, OpenSearch-style
aggregations (histogram / stats / date_histogram), and highlighting.

Reference shape: the OpenSearch query DSL surface the reference's search
store exposes (search_after cursors, regexp queries, aggregations and
highlight are all request-body features of the same /_search API the
store client drives)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pgspark_index import build, merge, query


@pytest.fixture(scope="module")
def corpus_pdf():
    rng = np.random.RandomState(29)
    vocab = (
        ["query", "quary", "quern", "fast", "table", "tale", "beta"]
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
    idx = str(tmp_path_factory.mktemp("extras") / "idx")
    df = spark.createDataFrame(corpus_pdf, "doc_id long, text string")
    build.build_index(spark, build.docs_unit_provider(df), idx,
                      num_units=2, partitions=4, sample_fraction=1.0)
    merge.merge_index(spark, idx)
    return idx


TERMS = ["query", "fast"]


def _ranked(spark, built, k):
    return [
        (r["doc_id"], r["score"])
        for r in query.search(spark, built, TERMS, k).collect()
    ]


# ---- search_after -----------------------------------------------------------


def test_search_after_pages_equal_offset_windows(spark, built):
    full = _ranked(spark, built, 21)
    cursor = (full[6][1], full[6][0])  # page size 7 -> cursor = row 7
    page2 = [
        (r["doc_id"], r["score"])
        for r in query.search_after(spark, built, TERMS, 7, after=cursor).collect()
    ]
    assert page2 == full[7:14]
    cursor3 = (page2[-1][1], page2[-1][0])
    page3 = [
        (r["doc_id"], r["score"])
        for r in query.search_after(spark, built, TERMS, 7, after=cursor3).collect()
    ]
    assert page3 == full[14:21]


def test_search_after_initial_cursor_is_page_one(spark, built):
    top = _ranked(spark, built, 10)
    page1 = [
        (r["doc_id"], r["score"])
        for r in query.search_after(spark, built, TERMS, 10).collect()
    ]
    assert page1 == top


def test_search_after_beyond_end_is_empty(spark, built):
    n_matched = query.match_docs(spark, built, TERMS).count()
    full = _ranked(spark, built, n_matched)
    cursor = (full[-1][1], full[-1][0])
    assert query.search_after(spark, built, TERMS, 5, after=cursor).count() == 0


def test_search_after_score_ties_break_on_doc_id(spark, built):
    # the fixture corpus has equal-score docs (identical tf/dl profiles);
    # paging through a tie region must not skip or duplicate docs
    full = _ranked(spark, built, 50)
    seen = []
    cursor = (float("inf"), -1)
    for _ in range(10):
        page = [
            (r["doc_id"], r["score"])
            for r in query.search_after(spark, built, TERMS, 5, after=cursor).collect()
        ]
        if not page:
            break
        seen.extend(page)
        cursor = (page[-1][1], page[-1][0])
    assert seen == full[: len(seen)]
    assert len(seen) == 50


# ---- regexp -----------------------------------------------------------------


def _lexicon_terms(corpus_pdf) -> set[str]:
    return set(" ".join(corpus_pdf["text"]).split())


@pytest.mark.parametrize("pattern", [
    "qu[ae]ry",        # char class behind a literal lead
    "(fast|beta)",     # top-level alternation -> no lead pruning
    "tab?le",          # quantified literal -> lead must shrink to 'ta'
    "w0[01][0-9]",     # class tail
    "quer.*",          # trailing any-run
])
def test_expand_regexp_matches_bruteforce(built, corpus_pdf, pattern):
    rx = re.compile(f"^(?:{pattern})$")
    want = sorted(t for t in _lexicon_terms(corpus_pdf) if rx.match(t))
    assert query.expand_regexp(built, pattern) == want
    assert want, f"pattern {pattern} matched nothing — fixture drift"


def test_expand_regexp_cap_warns_and_truncates(built):
    with pytest.warns(UserWarning, match="regexp"):
        got = query.expand_regexp(built, "w0.*", max_expansions=3)
    assert len(got) == 3
    assert got == sorted(got)


def test_search_regexp_equals_expand_then_search(spark, built):
    terms = query.expand_regexp(built, "qu[ae]r[yn]")
    a = query.search_regexp(spark, built, "qu[ae]r[yn]", k=10).collect()
    b = query.search(spark, built, terms, 10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


# ---- aggregations -----------------------------------------------------------


def _matched_ids(corpus_pdf, terms) -> set[int]:
    out = set()
    for did, text in zip(corpus_pdf["doc_id"], corpus_pdf["text"]):
        if set(text.split()) & set(terms):
            out.add(int(did))
    return out


def test_histogram_buckets(spark, built, corpus_pdf):
    meta_pdf = pd.DataFrame({
        "doc_id": corpus_pdf["doc_id"],
        "n_chars": corpus_pdf["text"].str.len().astype("int64"),
    })
    meta = spark.createDataFrame(meta_pdf, "doc_id long, n_chars long")
    got = {
        (r["bucket"], r["doc_count"])
        for r in query.search_histogram(
            spark, built, TERMS, meta, "n_chars", 50.0
        ).collect()
    }
    ids = _matched_ids(corpus_pdf, TERMS)
    sub = meta_pdf[meta_pdf["doc_id"].isin(ids)]
    want = {
        (float(b), int(c))
        for b, c in (np.floor(sub["n_chars"] / 50.0) * 50.0).value_counts().items()
    }
    assert got == want


def test_stats_agg(spark, built, corpus_pdf):
    meta_pdf = pd.DataFrame({
        "doc_id": corpus_pdf["doc_id"],
        "n_chars": corpus_pdf["text"].str.len().astype("int64"),
    })
    meta = spark.createDataFrame(meta_pdf, "doc_id long, n_chars long")
    row = query.search_stats(spark, built, TERMS, meta, "n_chars").collect()[0]
    sub = meta_pdf[meta_pdf["doc_id"].isin(_matched_ids(corpus_pdf, TERMS))]
    assert row["value_count"] == len(sub)
    assert row["min_value"] == sub["n_chars"].min()
    assert row["max_value"] == sub["n_chars"].max()
    assert row["sum_value"] == sub["n_chars"].sum()
    assert abs(row["avg_value"] - sub["n_chars"].mean()) < 1e-9


def test_date_histogram_buckets(spark, built, corpus_pdf):
    meta = spark.createDataFrame(
        pd.DataFrame({"doc_id": corpus_pdf["doc_id"]}), "doc_id long"
    ).withColumn(
        "ts",
        F.expr("timestamp'2025-03-01 00:00:00' + "
               "make_interval(0, 0, 0, 0, CAST(doc_id % 100 AS INT), 0, 0)"),
    )
    got = {
        (str(r["bucket"]), r["doc_count"])
        for r in query.search_date_histogram(
            spark, built, TERMS, meta, "ts", "day"
        ).collect()
    }
    ids = _matched_ids(corpus_pdf, TERMS)
    days = pd.Series(
        [pd.Timestamp("2025-03-01") + pd.Timedelta(hours=i % 100)
         for i in sorted(ids)]
    ).dt.floor("D")
    want = {
        (str(d), int(c)) for d, c in days.value_counts().items()
    }
    assert got == want


# ---- suggesters -------------------------------------------------------------


def test_suggest_completion_ranks_by_df(spark, built, corpus_pdf):
    dfs = {}
    for text in corpus_pdf["text"]:
        for t in set(text.split()):
            dfs[t] = dfs.get(t, 0) + 1
    want = sorted(
        ((t, c) for t, c in dfs.items() if t.startswith("qu")),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [
        (r["term"], r["doc_freq"])
        for r in query.suggest_completion(spark, built, "qu", n=10).collect()
    ]
    assert got == want


def test_suggest_term_did_you_mean(spark, built, corpus_pdf):
    got = [
        (r["term"], r["distance"])
        for r in query.suggest_term(spark, built, "quer", n=5).collect()
    ]
    # distance-1 neighbours first; the input term itself never suggested
    assert got and got[0][1] == 1
    assert "quer" not in [t for t, _ in got]
    import math
    dfs = {}
    for text in corpus_pdf["text"]:
        for t in set(text.split()):
            dfs[t] = dfs.get(t, 0) + 1

    def _lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]

    want = sorted(
        ((t, _lev(t, "quer")) for t in dfs
         if t.startswith("q") and t != "quer"
         and abs(len(t) - 4) <= 2 and _lev(t, "quer") <= 2),
        key=lambda x: (x[1], -dfs[x[0]], x[0]),
    )[:5]
    assert got == want


# ---- tombstone interaction --------------------------------------------------


def test_search_after_and_explain_respect_tombstones(spark, tmp_path_factory,
                                                     corpus_pdf):
    from pgspark_index import incremental

    idx = str(tmp_path_factory.mktemp("extras_tomb") / "idx")
    df = spark.createDataFrame(corpus_pdf, "doc_id long, text string")
    build.build_index(spark, build.docs_unit_provider(df), idx,
                      num_units=2, partitions=4, sample_fraction=1.0)
    merge.merge_index(spark, idx)
    dropped = {
        r["doc_id"] for r in query.search(spark, idx, TERMS, 3).collect()
    }  # kill the top 3 docs
    incremental.drop_docs(
        spark, idx,
        spark.createDataFrame([(int(d),) for d in dropped], "doc_id long"),
    )
    # merge re-derives tombstone-corrected n_docs/avgdl; survivor scores
    # legitimately change, so all assertions are post-drop self-consistent
    merge.merge_index(spark, idx)
    post = [
        (r["doc_id"], r["score"])
        for r in query.search(spark, idx, TERMS, 10).collect()
    ]
    assert not dropped & {d for d, _ in post}
    page2 = [
        (r["doc_id"], r["score"])
        for r in query.search_after(
            spark, idx, TERMS, 5, after=(post[4][1], post[4][0])
        ).collect()
    ]
    assert page2 == post[5:10]
    # explain on a tombstoned doc is empty; on a survivor it sums to its score
    assert query.explain_score(spark, idx, TERMS, next(iter(dropped))).count() == 0
    ex = query.explain_score(spark, idx, TERMS, post[0][0]).collect()
    assert sum(e["score"] for e in ex) == pytest.approx(post[0][1], abs=1e-9)


# ---- highlighting -----------------------------------------------------------


@pytest.fixture(scope="module")
def hl_built(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": np.arange(5, dtype="int64"),
        "text": [
            "aa bb cc dd query ee ff gg hh",     # interior match
            "query aa bb cc dd",                  # match at token 1
            "aa bb fast",                         # match at the tail
            "xx yy zz",                           # no query term
            "aa query bb fast cc query dd",       # multiple matches
        ],
    })
    idx = str(tmp_path_factory.mktemp("hl") / "idx")
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    build.build_index(spark, build.docs_unit_provider(df), idx,
                      num_units=1, partitions=2, sample_fraction=1.0)
    merge.merge_index(spark, idx)
    return idx, df


def test_highlight_snippets(spark, hl_built):
    idx, docs = hl_built
    rows = {
        r["doc_id"]: r
        for r in query.search_highlight(
            spark, idx, ["query", "fast"], 10, docs, window=2
        ).collect()
    }
    assert set(rows) == {0, 1, 2, 4}
    assert rows[0]["snippet"] == "cc dd query ee ff"
    assert rows[0]["matched_terms"] == "query"
    assert rows[1]["snippet"] == "query aa bb cc dd"
    assert rows[2]["snippet"] == "aa bb fast"
    assert rows[2]["matched_terms"] == "fast"
    # first occurrence anchors the snippet; both terms reported sorted
    assert rows[4]["snippet"] == "aa query bb fast cc"
    assert rows[4]["matched_terms"] == "fast,query"


def test_highlight_ordering_matches_search(spark, hl_built):
    idx, docs = hl_built
    hl = query.search_highlight(spark, idx, ["query", "fast"], 10, docs).collect()
    plain = query.search(spark, idx, ["fast", "query"], 10).collect()
    assert [r["doc_id"] for r in hl] == [r["doc_id"] for r in plain]


# ---- more_like_this ---------------------------------------------------------


def test_select_mlt_terms_ranks_by_tf_idf(spark, built, corpus_pdf):
    import math

    seed = str(corpus_pdf["text"].iloc[0])
    n_docs = len(corpus_pdf)
    tf = {}
    for t in seed.split():
        tf[t] = tf.get(t, 0) + 1
    dfs = {}
    for text in corpus_pdf["text"]:
        for t in set(text.split()):
            dfs[t] = dfs.get(t, 0) + 1
    want = sorted(
        tf,
        key=lambda t: (-(tf[t] * math.log(
            1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))), t),
    )[:5]
    assert query.select_mlt_terms(built, seed, max_query_terms=5) == sorted(want)


def test_select_mlt_terms_min_freq_knobs(built):
    # a term appearing once in the seed is dropped at min_term_freq=2
    got = query.select_mlt_terms(
        built, "query query fast", max_query_terms=10, min_term_freq=2
    )
    assert got == ["query"]
    # absent-from-index terms never survive (no df row)
    assert query.select_mlt_terms(built, "zzzz xxxx") == []


def test_more_like_this_excludes_seed_and_matches_search(spark, built, corpus_pdf):
    seed_id = 0
    seed = str(corpus_pdf["text"].iloc[seed_id])
    res = query.more_like_this(
        spark, built, seed, k=10, max_query_terms=5, exclude_doc_id=seed_id
    ).collect()
    assert seed_id not in [r["doc_id"] for r in res]
    terms = query.select_mlt_terms(built, seed, max_query_terms=5)
    manual = [
        (r["doc_id"], r["score"])
        for r in query.search(spark, built, terms, 11).collect()
        if r["doc_id"] != seed_id
    ][:10]
    assert [(r["doc_id"], r["score"]) for r in res] == manual


# ---- significant_terms ------------------------------------------------------


def test_significant_terms_jlh(spark, built, corpus_pdf):
    docs = spark.createDataFrame(corpus_pdf, "doc_id long, text string")
    got = [
        (r["term"], r["fg_count"], r["score"])
        for r in query.significant_terms(
            spark, built, TERMS, docs, n=5, min_doc_count=2
        ).collect()
    ]
    ids = _matched_ids(corpus_pdf, TERMS)
    n_docs = len(corpus_pdf)
    fg, bg = {}, {}
    for did, text in zip(corpus_pdf["doc_id"], corpus_pdf["text"]):
        for t in set(text.split()):
            bg[t] = bg.get(t, 0) + 1
            if int(did) in ids:
                fg[t] = fg.get(t, 0) + 1
    rows = []
    for t, f in fg.items():
        if f < 2 or t in TERMS:
            continue
        fr, br = f / len(ids), bg[t] / n_docs
        rows.append((t, f, (fr - br) * (fr / br)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    want = [(t, f, s) for t, f, s in rows[:5]]
    assert [(t, f) for t, f, _ in got] == [(t, f) for t, f, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-12


def test_explain_sums_to_search_score(spark, built):
    top = query.search(spark, built, TERMS, 3).collect()
    for r in top:
        ex = query.explain_score(spark, built, TERMS, r["doc_id"]).collect()
        assert sum(e["score"] for e in ex) == pytest.approx(r["score"], abs=1e-12)
        assert [e["term"] for e in ex] == sorted(e["term"] for e in ex)
        assert set(e["term"] for e in ex) <= set(TERMS)


def test_explain_unknown_doc_is_empty(spark, built):
    assert query.explain_score(spark, built, TERMS, 10**12).count() == 0


def test_significant_terms_excludes_query_terms(spark, built, corpus_pdf):
    docs = spark.createDataFrame(corpus_pdf, "doc_id long, text string")
    got = [
        r["term"]
        for r in query.significant_terms(
            spark, built, TERMS, docs, n=50, min_doc_count=1
        ).collect()
    ]
    assert not set(got) & set(TERMS)
