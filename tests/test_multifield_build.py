"""Single-pass multi-field build: one scan/tokenize/shuffle produces every
field's index, bit-identical to separate per-field builds (reference:
per-column mappings in one store, search_pg_mapper.go:137-183)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pgspark_index import build, merge, query


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(41)
    words = [f"w{i:05d}" for i in range(60)]
    texts = [
        " ".join(rng.choice(words, size=rng.randint(6, 40)))
        for _ in range(600)
    ]
    pdf = pd.DataFrame({"doc_id": np.arange(600, dtype="int64"), "text": texts})
    return spark.createDataFrame(pdf, "doc_id long, text string")


def _title():
    return F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " ")


def test_multifield_build_matches_separate_builds(spark, corpus, tmp_path):
    root = str(tmp_path / "mf")
    fdirs = build.build_index_multifield(
        spark, corpus, root,
        fields={"body": F.col("text"), "title": _title()},
        num_units=2, partitions=4,
    )
    assert set(fdirs) == {"body", "title"}

    # separate single-field builds of the same corpus
    sep = {}
    for name, col in [("body", F.col("text")), ("title", _title())]:
        d = str(tmp_path / f"sep_{name}")
        df = corpus.select("doc_id", col.alias("text"))
        build.build_index(spark, build.docs_unit_provider(df), d,
                          num_units=2, partitions=4, sample_fraction=1.0)
        merge.merge_index(spark, d)
        sep[name] = d

    for name in fdirs:
        a, b = merge.load_stats(fdirs[name]), merge.load_stats(sep[name])
        assert a["n_docs"] == b["n_docs"], name
        assert a["sum_doclen"] == b["sum_doclen"], name
        assert a["postings_bytes"] == b["postings_bytes"], name
        assert a["term_rows"] == b["term_rows"], name
        # identical search results per field
        for terms in (["w00001", "w00002"], ["w00010"], ["w00005", "w00009", "w00030"]):
            ra = query.search(spark, fdirs[name], terms, 20).collect()
            rb = query.search(spark, sep[name], terms, 20).collect()
            assert [(r["doc_id"], r["score"]) for r in ra] == [
                (r["doc_id"], r["score"]) for r in rb
            ], (name, terms)

    # multi-field query over the single-pass indexes == over separate ones
    got = query.search_multifield(
        spark, fdirs, ["w00001", "w00002", "w00010"], 15,
        boosts={"title": 2.0, "body": 1.0},
    ).collect()
    exp = query.search_multifield(
        spark, sep, ["w00001", "w00002", "w00010"], 15,
        boosts={"title": 2.0, "body": 1.0},
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in exp
    ]


def test_multifield_build_resume(spark, corpus, tmp_path):
    root = str(tmp_path / "mf2")
    build.build_index_multifield(
        spark, corpus, root, fields={"body": "text"}, num_units=2, partitions=4,
    )
    # re-run: all units committed in every field -> nothing rebuilt, stats stable
    before = merge.load_stats(build.field_index_dir(root, "body"))
    build.build_index_multifield(
        spark, corpus, root, fields={"body": "text"}, num_units=2, partitions=4,
    )
    after = merge.load_stats(build.field_index_dir(root, "body"))
    assert before == after


def test_multifield_poison_doc_quarantined(spark, tmp_path):
    """Per-doc quarantine parity with the single-field path: a poison row
    (null doc_id) is dropped from EVERY field, the unit commits, and each
    field's manifest carries the quarantined_docs count."""
    import os

    from pgspark_index import manifest

    clean = pd.DataFrame({
        "doc_id": np.arange(50, dtype="int64"),
        "text": [f"alpha beta w{i % 5}" for i in range(50)],
    })
    df = spark.createDataFrame(clean, "doc_id long, text string").unionByName(
        spark.createDataFrame([(None, "poison")], "doc_id long, text string")
    )
    root = str(tmp_path / "mfq")
    fdirs = build.build_index_multifield(
        spark, df, root,
        fields={"body": F.col("text"),
                "title": F.array_join(F.slice(F.split("text", " "), 1, 2), " ")},
        num_units=1, partitions=2,
    )
    for name, d in fdirs.items():
        st = merge.load_stats(d)
        assert st["n_docs"] == 50, name
        m = manifest.read_manifest(d)
        assert int(m["quarantined_docs"].sum()) == 1, name
    q = spark.read.parquet(
        os.path.join(build.quarantine_path(root), "unit=0")
    ).collect()
    assert len(q) == 1 and q[0]["doc_id"] == -1


def test_multifield_delta_tombstones_every_field(spark, tmp_path):
    """One-pass delta for a multi-field index: changed rows become a
    namespaced unit in EVERY field from one scan, superseded versions are
    tombstoned in every field dir, and each field index equals the
    single-field delta pipeline run on the same data."""
    import os

    from pgspark_index import incremental, manifest

    base = pd.DataFrame({
        "doc_id": np.arange(60, dtype="int64"),
        "text": [f"alpha w{i % 5} base{i}" for i in range(60)],
        "headline": [f"head w{i % 3} hl{i}" for i in range(60)],
    })
    fields = {"body": "text", "title": "headline"}
    root = str(tmp_path / "mfdelta")
    build.build_index_multifield(
        spark, spark.createDataFrame(base, "doc_id long, text string, headline string"),
        root, fields=fields, num_units=1, partitions=2,
    )

    delta = pd.DataFrame({
        "doc_id": np.arange(55, 65, dtype="int64"),
        "text": [f"alpha zz7 new{i}" for i in range(55, 65)],
        "headline": [f"newhead zz8 nh{i}" for i in range(55, 65)],
    })
    res = incremental.build_delta_multifield(
        spark,
        spark.createDataFrame(delta, "doc_id long, text string, headline string"),
        root, fields=fields, input_snapshot_id=1, partitions=2,
    )
    assert res["tombstones"] == 5  # ids 55..59 superseded
    assert res["built_units"] == [1_000_000]

    for f, d in res["field_indexes"].items():
        m = manifest.read_manifest(d)
        assert 1_000_000 in set(m["unit"].astype(int)), f
        assert os.path.isdir(
            os.path.join(incremental.tombstones_path(d), "snapshot-1")
        ), f
        assert merge.load_stats(d)["n_docs"] == 65, f

    # new-version terms hit in both fields; superseded versions are dead
    hits = query.search(spark, res["field_indexes"]["body"], ["zz7"], 20)
    assert {r["doc_id"] for r in hits.collect()} == set(range(55, 65))
    hits_t = query.search(spark, res["field_indexes"]["title"], ["zz8"], 20)
    assert {r["doc_id"] for r in hits_t.collect()} == set(range(55, 65))
    assert query.search(spark, res["field_indexes"]["body"], ["base55"], 5).count() == 0
    assert query.search(spark, res["field_indexes"]["body"], ["base54"], 5).count() == 1

    # equality with the single-field delta pipeline on the body field
    sep = str(tmp_path / "sep_body")
    bdf = spark.createDataFrame(base[["doc_id", "text"]], "doc_id long, text string")
    build.build_index(spark, build.docs_unit_provider(bdf), sep,
                      num_units=1, partitions=2, sample_fraction=1.0)
    merge.merge_index(spark, sep)
    ddf = spark.createDataFrame(delta[["doc_id", "text"]], "doc_id long, text string")
    incremental.build_delta(
        spark, build.docs_unit_provider(ddf), sep,
        input_snapshot_id=1, partitions=2, sample_fraction=1.0,
    )
    for terms in (["alpha"], ["zz7"], ["w1"]):
        ra = query.search(spark, res["field_indexes"]["body"], terms, 20).collect()
        rb = query.search(spark, sep, terms, 20).collect()
        assert [(r["doc_id"], r["score"]) for r in ra] == [
            (r["doc_id"], r["score"]) for r in rb
        ], terms
