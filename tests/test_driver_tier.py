"""Driver small-query tier (round-6 optimization): bit-exact parity with
the distributed path, and a gate that actually gates.

The tier runs a bounded-size query entirely on the driver (same pyarrow
term-IN segment read, same wand scorers, same merge order); everything
over PGSPARK_QUERY_DRIVER_BYTES takes the distributed path unchanged.
"""

import pandas as pd
import pytest

from pgspark_index import build, merge, query

DOCS = [
    "alpha beta gamma delta alpha",
    "beta beta gamma",
    "alpha epsilon zeta eta theta",
    "gamma delta delta",
    "alpha beta alpha beta gamma delta",
    "iota kappa alpha",
    "beta gamma delta epsilon",
    "unrelated words entirely here",
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tier") / "idx")
    pdf = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    docs = spark.createDataFrame(pdf, "doc_id long, text string")
    build.build_index(
        spark, build.docs_unit_provider(docs), d, num_units=2, partitions=2
    )
    merge.merge_index(spark, d)
    return d


def _collect(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize(
    "kwargs",
    [
        {"terms": ["alpha", "gamma"]},
        {"terms": ["alpha", "gamma"], "mode": "and"},
        {"terms": ["alpha"], "exclude_terms": ["delta"]},
        {"terms": ["alpha", "beta"], "strategy": "exhaustive"},
        {"terms": ["alpha", "beta"], "strategy": "bmw"},
        {"terms": ["zz_missing", "beta"]},
    ],
)
def test_tier_matches_distributed(spark, idx, monkeypatch, kwargs):
    monkeypatch.setenv("PGSPARK_QUERY_DRIVER_BYTES", "0")
    dist = _collect(query.search(spark, idx, k=5, **kwargs))
    monkeypatch.setenv("PGSPARK_QUERY_DRIVER_BYTES", str(64 << 20))
    tier = _collect(query.search(spark, idx, k=5, **kwargs))
    assert tier == dist  # bit-exact: same scorers, same merge order


def test_tier_gate_bounds_bytes(idx):
    # a cap smaller than the decode working set must refuse the tier
    assert not query._driver_tier_ok([0], {"alpha": 10**9}, ["alpha"])
    assert query._driver_tier_ok([0], {"alpha": 100}, ["alpha"])
    # unit-count bound: a many-unit index never serializes on the driver
    assert not query._driver_tier_ok(
        list(range(query._DRIVER_TIER_MAX_UNITS + 1)), {"alpha": 100}, ["alpha"]
    )


def test_tier_batch_and_after_match(spark, idx, monkeypatch):
    qs = [
        {"query_id": 0, "terms": ["alpha", "gamma"], "k": 3},
        {"query_id": 1, "terms": ["beta"], "k": 4},
        {"query_id": 2, "terms": ["zz_absent"], "k": 3},
    ]
    page1 = _collect(query.search(spark, idx, ["alpha", "beta"], 3))
    cursor = page1[-1][::-1][::-1]  # (doc_id, score) -> use as-is below

    monkeypatch.setenv("PGSPARK_QUERY_DRIVER_BYTES", "0")
    dist_b = sorted(tuple(r) for r in query.search_batch(spark, idx, qs).collect())
    dist_a = _collect(
        query.search_after(
            spark, idx, ["alpha", "beta"], 3, after=(page1[-1][1], page1[-1][0])
        )
    )
    monkeypatch.setenv("PGSPARK_QUERY_DRIVER_BYTES", str(64 << 20))
    tier_b = sorted(tuple(r) for r in query.search_batch(spark, idx, qs).collect())
    tier_a = _collect(
        query.search_after(
            spark, idx, ["alpha", "beta"], 3, after=(page1[-1][1], page1[-1][0])
        )
    )
    assert tier_b == dist_b
    assert tier_a == dist_a


def test_distributed_expansion_matches_driver_stream(spark, idx, monkeypatch):
    """Unpruned fuzzy / leading-wildcard / regexp expansion over a lexicon
    beyond the byte gate runs as a Spark job (mapInArrow over the lexicon
    with the same RE2 / numpy-DP kernels) — term sets must be identical to
    the driver stream."""
    cases = [
        lambda: query.expand_wildcard(idx, "*eta", 16),
        lambda: query.expand_regexp(idx, "[bz]eta", 16),
        lambda: query.expand_fuzzy(idx, "beta", 1, 16, prefix_length=0),
        lambda: query.expand_fuzzy(idx, "gamm", 1, 16, prefix_length=0,
                                   transpositions=True),
    ]
    monkeypatch.setenv("PGSPARK_EXPAND_DRIVER_BYTES", str(64 << 20))
    stream = [c() for c in cases]
    monkeypatch.setenv("PGSPARK_EXPAND_DRIVER_BYTES", "0")  # force the job
    job = [c() for c in cases]
    assert job == stream
    assert stream[0]  # *eta matches beta/zeta/eta-family terms


def test_local_df_roundtrips_doubles_exactly(spark):
    import math

    vals = [0.1 + 0.2, 1e-300, 12345.678901234567, math.pi, 3.0]
    rows = [(i, v) for i, v in enumerate(vals)]
    got = _collect(query._local_df(spark, rows, query.RESULT_SCHEMA))
    assert got == rows  # bit-exact float64 round-trip through the SQL literal
