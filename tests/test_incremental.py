"""Incremental build: delta units + tombstones give correct reads
immediately; compaction makes the index exactly equal a full rebuild."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pgspark_index import build, fixtures, incremental, manifest, merge, query

N_BASE = 400
SENTINEL_NEW = "zzznewterm"


@pytest.fixture(scope="module")
def corpora(spark):
    base_pdf = fixtures.make_webtext_pdf(N_BASE, seed=11)
    base_pdf = base_pdf.drop_duplicates(subset=["url"], keep="last")  # no recrawls here
    base = spark.createDataFrame(base_pdf, schema=fixtures.WEBTEXT_DDL)

    # delta: 25 updated urls (text replaced by a sentinel term), 15 new urls
    updated = base_pdf.head(25).copy()
    updated["text"] = SENTINEL_NEW + " content updated " + SENTINEL_NEW
    updated["html"] = None
    updated["warc_ts"] = updated["warc_ts"] + dt.timedelta(days=90)
    new_pdf = fixtures.make_webtext_pdf(15, seed=77).drop_duplicates(subset=["url"])
    new_pdf["url"] = new_pdf["url"].str.replace("https://site", "https://newsite")
    import pandas as pd

    delta_pdf = pd.concat([updated, new_pdf], ignore_index=True)
    delta = spark.createDataFrame(delta_pdf, schema=fixtures.WEBTEXT_DDL)
    merged = base.join(delta.select("url"), "url", "left_anti").unionByName(delta)
    return base, delta, merged, set(updated["url"])


def test_incremental_lifecycle(spark, corpora, tmp_index, tmp_path):
    base, delta, merged, updated_urls = corpora

    build.build_index(spark, base, tmp_index, num_units=2, partitions=4,
                      sample_fraction=1.0)
    merge.merge_index(spark, tmp_index)

    # sentinel term absent before the delta
    assert query.search(spark, tmp_index, [SENTINEL_NEW], 5).count() == 0

    res = incremental.build_delta(spark, delta, tmp_index, input_snapshot_id=1,
                                  num_units=1, partitions=4, sample_fraction=1.0)
    assert res["tombstones"] == 25
    merge.merge_index(spark, tmp_index)

    # updated docs are found under their NEW content...
    hits = query.search(spark, tmp_index, [SENTINEL_NEW], 30).collect()
    assert len(hits) == 25
    updated_ids = {
        r["doc_id"]
        for r in base.select(F.xxhash64("url").alias("doc_id"), "url")
        .filter(F.col("url").isin(list(updated_urls)))
        .collect()
    }
    assert {h["doc_id"] for h in hits} == updated_ids

    # ...and their OLD content no longer surfaces them (tombstone exclusion):
    # the new text contains no original-vocab terms, so any w-vocab query
    # with unbounded k must never return an updated doc — in any strategy.
    for strategy in ("exhaustive", "maxscore", "bmw"):
        for q in fixtures.make_query_set(8, seed=5):
            got = query.search(
                spark, tmp_index, q["terms"], 10_000, strategy=strategy
            ).collect()
            assert not ({r["doc_id"] for r in got} & updated_ids), (strategy, q)

    # compaction -> exactly a full rebuild of the merged corpus
    incremental.compact(spark, tmp_index)
    assert incremental.load_tombstones(tmp_index) is None

    clean = str(tmp_path / "clean")
    build.build_index(spark, merged, clean, num_units=2, partitions=4,
                      sample_fraction=1.0)
    merge.merge_index(spark, clean)

    sa, sb = merge.load_stats(tmp_index), merge.load_stats(clean)
    assert sa["n_docs"] == sb["n_docs"]
    assert sa["sum_doclen"] == sb["sum_doclen"]

    for q in fixtures.make_query_set(12, seed=6) + [
        {"query_id": 99, "terms": [SENTINEL_NEW], "k": 30}
    ]:
        a = query.search(spark, tmp_index, q["terms"], q["k"]).collect()
        b = query.search(spark, clean, q["terms"], q["k"]).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ], q


def test_resume_delta_units(spark, corpora, tmp_index):
    base, delta, _, _ = corpora
    build.build_index(spark, base, tmp_index, num_units=1, partitions=4,
                      sample_fraction=1.0)
    incremental.build_delta(spark, delta, tmp_index, input_snapshot_id=3,
                            num_units=2, partitions=4, sample_fraction=1.0)
    # re-running the same snapshot builds nothing new
    res = incremental.build_delta(spark, delta, tmp_index, input_snapshot_id=3,
                                  num_units=2, partitions=4, sample_fraction=1.0)
    assert res["built_units"] == []
    assert manifest.completed_units(tmp_index, 3) == {3_000_000, 3_000_001}

def test_compact_with_1e5_tombstones(spark, tmp_index, tmp_path):
    """Scale-shape check: compaction with >=10^5 tombstones goes through the
    distributed anti-join / broadcast-array paths (never a literal IN list
    or a driver toPandas of superseded ids)."""
    import numpy as np
    import os

    base_pdf = fixtures.make_webtext_pdf(300, seed=21).drop_duplicates(
        subset=["url"], keep="last"
    )
    base = spark.createDataFrame(base_pdf, schema=fixtures.WEBTEXT_DDL)
    build.build_index(spark, base, tmp_index, num_units=1, partitions=4,
                      sample_fraction=1.0)
    merge.merge_index(spark, tmp_index)
    docs = spark.read.parquet(build.docs_path(tmp_index))
    real_ids = [r["doc_id"] for r in docs.limit(50).collect()]

    # fabricate a large tombstone set: 50 real ids + ~2e5 synthetic
    n_fake = 200_000
    rng = np.random.RandomState(3)
    tomb = spark.createDataFrame(
        [(int(x), 9) for x in rng.randint(-2**62, 2**62, size=n_fake)]
        + [(int(x), 9) for x in real_ids],
        "doc_id bigint, snapshot bigint",
    )
    d = incremental.tombstones_path(tmp_index)
    os.makedirs(d, exist_ok=True)
    tomb.write.mode("overwrite").parquet(os.path.join(d, "snapshot-9"))

    docs_arr, snaps = incremental.load_tombstones(tmp_index)
    assert docs_arr.size >= n_fake  # vectorized load handled the volume

    res = incremental.compact(spark, tmp_index)
    assert res["removed_docs"] == 50
    assert incremental.load_tombstones(tmp_index) is None
    left = spark.read.parquet(build.docs_path(tmp_index))
    assert left.count() == len(base_pdf) - 50
    # surviving docs still searchable, removed ones not
    got = query.search(spark, tmp_index, fixtures.make_query_set(4, seed=9)[0]["terms"], 10_000).collect()
    assert not ({r["doc_id"] for r in got} & set(real_ids))


def test_snapshot_source_adapter(spark, corpora, tmp_path):
    """sources.py: snapshot-pinned + incremental reads (Iceberg shape,
    parquet fallback) feeding the same delta pipeline end-to-end."""
    from pgspark_index import sources

    base, delta, merged, _updated = corpora
    table = str(tmp_path / "webtable")
    sources.write_snapshot(base, table, 1)
    sources.write_snapshot(delta, table, 2)

    assert sources.latest_snapshot_id(spark, table) == 2
    # snapshot-pinned full reads
    assert sources.read_snapshot(spark, table, 1).count() == base.count()
    assert (
        sources.read_snapshot(spark, table).count() == base.count() + delta.count()
    )
    # incremental read = exactly the delta rows
    inc = sources.incremental_read(spark, table, start_snapshot_id=1)
    assert inc.count() == delta.count()
    assert {r["url"] for r in inc.select("url").collect()} == {
        r["url"] for r in delta.select("url").collect()
    }
    # empty range
    assert sources.incremental_read(spark, table, start_snapshot_id=2).count() == 0

    # end-to-end: base build from snapshot 1, delta from the incremental read
    idx = str(tmp_path / "idx")
    build.build_index(
        spark, sources.read_snapshot(spark, table, 1), idx,
        num_units=1, partitions=4, input_snapshot_id=1, sample_fraction=1.0,
    )
    merge.merge_index(spark, idx)
    incremental.build_delta(
        spark, inc, idx, input_snapshot_id=2, partitions=4, sample_fraction=1.0
    )
    res = query.search(spark, idx, [SENTINEL_NEW], k=5).collect()
    assert len(res) == 5  # delta-only term visible right after the delta


def test_pre_compaction_stats_corrected(spark, corpora, tmp_path):
    """Between a delta and compaction, n_docs/avgdl equal a from-scratch
    build of the LIVE corpus (superseded versions subtracted at merge
    time); compaction then makes the whole index bit-equal (covered by
    test_incremental_lifecycle)."""
    base, delta, merged, _updated = corpora
    idx = str(tmp_path / "idx")
    build.build_index(spark, base, idx, num_units=2, partitions=4,
                      sample_fraction=1.0)
    merge.merge_index(spark, idx)
    incremental.build_delta(spark, delta, idx, input_snapshot_id=1,
                            num_units=1, partitions=4, sample_fraction=1.0)
    # build_delta already refreshes the lexicon+stats
    live = merge.load_stats(idx)

    clean = str(tmp_path / "clean")
    build.build_index(spark, merged, clean, num_units=2, partitions=4,
                      sample_fraction=1.0)
    ref = merge.merge_index(spark, clean)

    assert live["tombstoned_docs"] == 25
    assert live["n_docs"] == ref["n_docs"]
    assert live["sum_doclen"] == ref["sum_doclen"]
    assert abs(live["avgdl"] - ref["avgdl"]) < 1e-12


def test_compact_preserves_ranged_search(spark, corpora, tmp_index):
    """Regression (ADVICE r3): compact's manifest refresh must keep
    ord_partitions — losing it nulls the column (int -> float64/NaN on
    read) and crashes search_ranged on any compacted index."""
    base, delta, _merged, _updated = corpora
    build.build_index(spark, base, tmp_index, num_units=1, partitions=4,
                      sample_fraction=1.0)
    merge.merge_index(spark, tmp_index)
    incremental.build_delta(spark, delta, tmp_index, input_snapshot_id=1,
                            num_units=1, partitions=4, sample_fraction=1.0)
    incremental.compact(spark, tmp_index)
    m = manifest.read_manifest(tmp_index)
    assert m["ord_partitions"].notna().all()
    for q in fixtures.make_query_set(6, seed=13):
        a = query.search(spark, tmp_index, q["terms"], q["k"]).collect()
        b = query.search_ranged(spark, tmp_index, q["terms"], q["k"],
                                ranges=3).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ], q


def test_staging_tombstones_invisible(spark, tmp_index):
    """Regression (ADVICE r3): a crashed mid-write staging dir must never
    be discovered as committed tombstones."""
    import os

    d = incremental.tombstones_path(tmp_index)
    staged = os.path.join(d, ".staging-snapshot-7")
    os.makedirs(staged, exist_ok=True)
    spark.createDataFrame(
        [(1, 7)], "doc_id bigint, snapshot bigint"
    ).write.mode("overwrite").parquet(staged)
    assert incremental._tombstone_files(tmp_index) == []
    assert incremental.load_tombstones(tmp_index) is None
