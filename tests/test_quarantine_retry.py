"""Per-document retry of quarantined poison docs.

Reference behavior: the store retrier resends only the retriable failed
documents of a bulk request, never the whole batch
(/root/reference/pkg/wal/processor/search/search_store_retrier.go:94-150).
Here the quarantine sidecar is the failed-docs set; ``retry_quarantined``
re-ingests exactly those doc_ids from a corrected source as a delta unit,
clears the rows that succeeded, and keeps unretriable (-1) rows.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pgspark_index import build, incremental, manifest, merge, query


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(40)),
            "text": [
                f"alpha beta page {i} w{i % 7}" + (" zmagic" if i == 7 else "")
                for i in range(40)
            ],
        }
    )
    return spark.createDataFrame(pdf, "doc_id long, text string")


def test_retry_quarantined_reingests_and_clears(spark, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    # build WITHOUT doc 7 (standing in for a doc that failed at build time)
    build.build_index(
        spark, build.docs_unit_provider(corpus.filter(F.col("doc_id") != 7)),
        idx, num_units=1, partitions=4, sample_fraction=1.0,
    )
    merge.merge_index(spark, idx)
    assert query.search(spark, idx, ["zmagic"], 5).count() == 0

    # synthesize the quarantine sidecar: doc 7 (retriable) + an
    # unreadable-identity row (-1, unretriable)
    qdir = os.path.join(build.quarantine_path(idx), "unit=0")
    spark.createDataFrame(
        [(7, "ValueError: synthetic poison"), (-1, "ValueError: null doc_id")],
        "doc_id long, error string",
    ).write.parquet(qdir)

    res = incremental.retry_quarantined(
        spark, build.docs_unit_provider(corpus), idx,
        input_snapshot_id=1, sample_fraction=1.0,
    )
    assert res["retried"] == 1
    assert res["still_quarantined"] == 1  # the -1 row is unretriable
    assert res["built_units"] == [1_000_000]
    assert res["tombstones"] == 0  # doc 7 was never indexed

    # the retried doc is searchable and counted in global stats
    hits = query.search(spark, idx, ["zmagic"], 5).collect()
    assert [r["doc_id"] for r in hits] == [7]
    assert merge.load_stats(idx)["n_docs"] == 40

    # sidecar now holds ONLY the unretriable row
    q = spark.read.parquet(build.quarantine_path(idx)).collect()
    assert len(q) == 1 and q[0]["doc_id"] == -1

    # delta unit committed through the standard manifest protocol
    m = manifest.read_manifest(idx)
    assert 1_000_000 in set(m["unit"].astype(int))

    # idempotent: nothing retriable left -> no new unit, no clearing
    res2 = incremental.retry_quarantined(
        spark, build.docs_unit_provider(corpus), idx,
        input_snapshot_id=2, sample_fraction=1.0,
    )
    assert res2["retried"] == 0
    assert res2["still_quarantined"] == 1
    assert res2["built_units"] == []


def test_retry_no_quarantine_is_noop(spark, corpus, tmp_path):
    idx = str(tmp_path / "noq")
    build.build_index(
        spark, build.docs_unit_provider(corpus), idx,
        num_units=1, partitions=4, sample_fraction=1.0,
    )
    merge.merge_index(spark, idx)
    res = incremental.retry_quarantined(
        spark, build.docs_unit_provider(corpus), idx, input_snapshot_id=1,
    )
    assert res == {"retried": 0, "still_quarantined": 0, "built_units": []}
