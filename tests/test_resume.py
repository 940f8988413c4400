"""Resumability: kill mid-build -> rerun skips committed units, final index
identical to an uninterrupted build (BASELINE.md acceptance row 5)."""

import glob
import os

import pytest

from pgspark_index import build, fixtures, manifest, merge, query

N_DOCS = 600


@pytest.fixture(scope="module")
def corpus(spark):
    return fixtures.make_webtext_df(spark, N_DOCS, seed=7, partitions=4)


def _postings_fingerprint(spark, index_dir):
    """Order-insensitive content hash of all segment rows."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(build.segments_path(index_dir))
    return (
        df.select(
            F.expr("bit_xor(xxhash64(term, salt, df, cf, postings))").alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
    )


def test_resume_skips_committed_units(spark, corpus, tmp_index):
    # simulate a crash: only units 0 and 1 of 3 complete
    res1 = build.build_index(
        spark, corpus, tmp_index, num_units=3, partitions=4,
        sample_fraction=1.0, salt_target=400, units=[0, 1],
    )
    assert res1["built_units"] == [0, 1]
    assert manifest.completed_units(tmp_index) == {0, 1}

    # restart: full build resumes, only unit 2 is recomputed
    res2 = build.build_index(
        spark, corpus, tmp_index, num_units=3, partitions=4,
        sample_fraction=1.0, salt_target=400,
    )
    assert res2["built_units"] == [2]
    assert res2["skipped_units"] == [0, 1]

    # idempotent: a third run does nothing
    res3 = build.build_index(
        spark, corpus, tmp_index, num_units=3, partitions=4,
        sample_fraction=1.0, salt_target=400,
    )
    assert res3["built_units"] == []


def test_resumed_index_identical_to_clean_build(spark, corpus, tmp_index, tmp_path):
    clean_dir = str(tmp_path / "clean")
    build.build_index(
        spark, corpus, tmp_index, num_units=3, partitions=4,
        sample_fraction=1.0, salt_target=400, units=[0],
    )
    build.build_index(
        spark, corpus, tmp_index, num_units=3, partitions=4,
        sample_fraction=1.0, salt_target=400,
    )
    build.build_index(
        spark, corpus, clean_dir, num_units=3, partitions=4,
        sample_fraction=1.0, salt_target=400,
    )
    merge.merge_index(spark, tmp_index)
    merge.merge_index(spark, clean_dir)

    assert _postings_fingerprint(spark, tmp_index) == _postings_fingerprint(spark, clean_dir)
    assert merge.load_stats(tmp_index) == merge.load_stats(clean_dir)

    # same query results from both
    for q in fixtures.make_query_set(5, seed=99):
        a = query.search(spark, tmp_index, q["terms"], q["k"]).collect()
        b = query.search(spark, clean_dir, q["terms"], q["k"]).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]


def test_manifest_lineage_fields(spark, corpus, tmp_index):
    build.build_index(
        spark, corpus, tmp_index, num_units=2, partitions=4,
        sample_fraction=1.0, salt_target=400,
    )
    m = manifest.read_manifest(tmp_index)
    assert set(m["status"]) == {manifest.STATUS_COMPLETED}
    assert (m["row_count"] > 0).all()
    assert (m["term_count"] > 0).all()
    assert (m["bytes"] > 0).all()
    assert m["row_count"].sum() == N_DOCS  # recrawled urls dedup to N_DOCS... adjusted below if needed
