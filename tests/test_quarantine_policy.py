"""Quarantine error classification + volume guard, sidecar swap crash
recovery, and multifield version-LWW (round-5 ADVICE fixes).

Reference semantics: the store retrier distinguishes per-document data
failures from internal/retriable errors and never converts the latter to
silent data loss (search_store_retrier.go:94-150)."""

import os

import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from pgspark_index import build, incremental, manifest, merge, query


def test_quarantinable_classification():
    assert build._quarantinable(ValueError("bad text"))
    assert build._quarantinable(pa.lib.ArrowInvalid("bad arrow data"))
    assert build._quarantinable(TypeError("bad type"))
    assert build._quarantinable(UnicodeDecodeError("utf-8", b"", 0, 1, "x"))
    # infra/internal failures must FAIL the unit, not quarantine docs
    assert not build._quarantinable(MemoryError())
    assert not build._quarantinable(pa.lib.ArrowMemoryError("malloc"))
    assert not build._quarantinable(OSError("disk"))
    assert not build._quarantinable(RuntimeError("internal bug"))
    assert not build._quarantinable(Exception("generic"))


@pytest.fixture(scope="module")
def poison_corpus(spark):
    pdf = pd.DataFrame(
        {"doc_id": [float(i) for i in range(12)],
         "text": [f"alpha beta doc {i}" for i in range(12)]}
    )
    pdf.loc[5, "doc_id"] = None  # null id -> ValueError in the tokenize stage
    return spark.createDataFrame(pdf, "doc_id double, text string").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )


def test_volume_guard_fails_unit(spark, poison_corpus, tmp_path):
    idx = str(tmp_path / "guard")
    with pytest.raises(RuntimeError, match="exceed the threshold"):
        build.build_index(
            spark, build.docs_unit_provider(poison_corpus), idx,
            num_units=1, partitions=4, sample_fraction=1.0,
            quarantine_max_docs=0, quarantine_max_frac=0.0,
        )
    m = manifest.read_manifest(idx)
    assert list(m[m["unit"] == 0]["status"]) == [manifest.STATUS_FAILED]
    # default thresholds tolerate the scattered poison doc
    idx2 = str(tmp_path / "ok")
    build.build_index(
        spark, build.docs_unit_provider(poison_corpus), idx2,
        num_units=1, partitions=4, sample_fraction=1.0,
    )
    m2 = manifest.read_manifest(idx2)
    assert int(m2["quarantined_docs"].sum()) == 1
    assert list(m2["status"]) == [manifest.STATUS_COMPLETED]


def test_swap_recovery_finishes_interrupted_rename(spark, tmp_path):
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(10), "text": ["w x y"] * 10}),
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build.build_index(spark, build.docs_unit_provider(corpus), idx,
                      num_units=1, partitions=2, sample_fraction=1.0)
    merge.merge_index(spark, idx)
    qdir = os.path.join(build.quarantine_path(idx), "unit=0")
    spark.createDataFrame(
        [(-1, "ValueError: null doc_id")], "doc_id long, error string"
    ).write.parquet(qdir)
    # simulate the crash window between the two renames: qpath moved away,
    # staging (the new attempt log) written but not yet renamed in
    qpath = build.quarantine_path(idx)
    staging = os.path.join(idx, ".quarantine-staging")
    os.rename(qpath, staging)
    assert not os.path.isdir(qpath)
    res = incremental.retry_quarantined(
        spark, build.docs_unit_provider(corpus), idx,
        input_snapshot_id=1, sample_fraction=1.0,
    )
    # recovery finished the swap before reading: the stranded -1 row is
    # visible again (still unretriable), never reported as "no quarantine"
    assert res["still_quarantined"] == 1
    assert not os.path.isdir(staging)
    assert os.path.isdir(qpath)


SENT_NEW, SENT_OLD = "zzznewest", "zzzstale"


def test_multifield_version_lww(spark, tmp_path):
    # duplicate doc_ids within one batch: the row with the HIGHEST version
    # must win in every field (mirrors single-field LSN-as-version LWW)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 1, 2, 2, 3],
            "version": [2, 1, 1, 9, 1],
            "text": [
                f"{SENT_NEW} body one", f"{SENT_OLD} body one",
                f"{SENT_OLD} body two", f"{SENT_NEW} body two",
                "plain body three",
            ],
        }
    )
    docs = spark.createDataFrame(pdf, "doc_id long, version long, text string")
    root = str(tmp_path / "mf")
    build.build_index_multifield(
        spark, docs, root,
        fields={"body": F.col("text"),
                "head": F.substring("text", 1, 12)},
        num_units=1, partitions=2, version_col="version",
    )
    hits = query.search_multifield(spark, root, [SENT_NEW], 5).collect()
    assert sorted(r["doc_id"] for r in hits) == [1, 2]
    assert query.search_multifield(spark, root, [SENT_OLD], 5).count() == 0
