"""Failure ledger + oversize guards.

Reference semantics being mirrored:
- failed units are recorded with status + error and RETRIED on resume
  (/root/reference/pkg/snapshot/generator/snapshot_generator_recorder.go:241-379);
- ignore-errors knob drops the failed batch, counts it, logs DATALOSS
  (/root/reference/pkg/wal/processor/batch/wal_batch_sender.go:281-283,353-367);
- doc IDs > 512 bytes are skipped (search_store.go:137-143) and terms over
  the Lucene byte cap are dropped with accounting
  (opensearch_mapper.go:44-53).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pgspark_index import build, manifest, merge, query


def _mini_webtext(spark, long_token_doc=False, long_url_doc=False):
    rows = []
    for i in range(30):
        rows.append((f"https://ex.com/p{i}", f"common text page {i} alpha beta", i))
    if long_token_doc:
        rows.append(
            ("https://ex.com/giant", "normal words then " + "x" * 40 + " tail", 99)
        )
    if long_url_doc:
        rows.append(("https://ex.com/" + "u" * 600, "oversized identity doc", 98))
    df = spark.createDataFrame(rows, "url string, text string, n int")
    return df.select(
        "url",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("n")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )


def test_failed_unit_recorded_and_retried(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _mini_webtext(spark)
    base = build.webtext_unit_provider(corpus)
    boom = {"armed": True}

    def provider(unit, num_units):
        if unit == 1 and boom["armed"]:
            raise RuntimeError("injected unit failure")
        return base(unit, num_units)

    with pytest.raises(RuntimeError, match="injected"):
        build.build_index(spark, provider, idx, num_units=2, partitions=4,
                          sample_fraction=1.0)
    m = manifest.read_manifest(idx)
    failed = m[m["status"] == manifest.STATUS_FAILED]
    assert list(failed["unit"]) == [1]
    assert "injected unit failure" in failed.iloc[0]["error"]
    # unit 0 committed before the failure; resume retries ONLY unit 1
    assert manifest.completed_units(idx) == {0}

    boom["armed"] = False
    res = build.build_index(spark, provider, idx, num_units=2, partitions=4,
                            sample_fraction=1.0)
    assert res["built_units"] == [1] and res["skipped_units"] == [0]
    m2 = manifest.read_manifest(idx)
    assert set(m2["status"]) == {manifest.STATUS_COMPLETED}
    assert manifest.completed_units(idx) == {0, 1}


def test_ignore_unit_errors_continues(spark, tmp_path):
    idx = str(tmp_path / "idx")
    base = build.webtext_unit_provider(_mini_webtext(spark))

    def provider(unit, num_units):
        if unit == 1:
            raise RuntimeError("still broken")
        return base(unit, num_units)

    res = build.build_index(spark, provider, idx, num_units=3, partitions=4,
                            sample_fraction=1.0, ignore_unit_errors=True)
    assert res["failed_units"] == [1]
    assert set(res["built_units"]) == {0, 2}


def test_oversize_term_guard_drops_and_accounts(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _mini_webtext(spark, long_token_doc=True)
    build.build_index(spark, corpus, idx, num_units=1, partitions=4,
                      sample_fraction=1.0, max_term_bytes=20)
    merge.merge_index(spark, idx)
    lex = merge.read_lexicon(spark, idx)
    assert lex.filter(F.length("term") > 20).count() == 0
    m = manifest.read_manifest(idx)
    assert int(m["dropped_terms"].sum()) == 1  # the x*40 token, one posting
    # doclen still counts the dropped token (Lucene norm semantics)
    docs = spark.read.parquet(build.docs_path(idx))
    giant = docs.filter(F.col("url") == "https://ex.com/giant").collect()[0]
    assert giant["doclen"] == 5
    # and the doc is still searchable by its surviving terms
    res = query.search(spark, idx, ["tail"], k=3).collect()
    assert giant["doc_id"] in [r["doc_id"] for r in res]


def test_oversize_id_guard_skips_doc(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _mini_webtext(spark, long_url_doc=True)
    build.build_index(spark, corpus, idx, num_units=1, partitions=4,
                      sample_fraction=1.0)
    docs = spark.read.parquet(build.docs_path(idx))
    assert docs.filter(F.octet_length("url") > 512).count() == 0
    assert docs.count() == 30  # the oversized-identity doc was skipped


def test_schema_first_mapping(spark, tmp_path):
    """Typed field mapping is written BEFORE data segments (schema-first,
    search_store.go:203-229 analog) and types follow the search_pg_mapper
    lattice."""
    from pgspark_index import fields

    idx = str(tmp_path / "idx")
    corpus = _mini_webtext(spark)
    build.build_index(spark, corpus, idx, num_units=1, partitions=4,
                      sample_fraction=1.0)
    m = fields.read_mapping(idx)
    assert m is not None and m["format"].startswith("pgspark-field-mapping")
    f = m["fields"]
    assert f["text"]["type"] == "text"       # the full-text-indexed field
    assert f["url"]["type"] == "keyword"
    assert f["warc_ts"]["type"] == "date"
    assert f["html"]["type"] == "binary"
    assert f["lang"]["type"] == "keyword"


def test_schema_evolution_rename_alias(spark, tmp_path):
    """Schema evolution without segment rewrites (wal_schema_diff.go:59-80;
    renames become aliases, search_store.go:302-316): added fields extend
    the mapping, renamed fields resolve through aliases, removed fields are
    deprecated, type changes are recorded as conflicts — and the version
    bumps on every change."""
    from pgspark_index import fields

    idx = str(tmp_path / "idx")
    corpus = _mini_webtext(spark)
    build.build_index(spark, corpus, idx, num_units=1, partitions=4,
                      sample_fraction=1.0)
    m0 = fields.read_mapping(idx)
    assert m0["version"] == 1

    # evolve: lang renamed to language, html dropped, score added,
    # warc_ts changes type (timestamp -> string = conflict)
    evolved = corpus.select(
        "url",
        F.col("warc_ts").cast("string").alias("warc_ts"),
        "text",
        F.col("lang").alias("language"),
        F.lit(0.5).cast("double").alias("score"),
    )
    diff = fields.evolve_mapping(idx, evolved, renames={"lang": "language"})
    assert diff["renamed"] == {"lang": "language"}
    assert "score" in diff["added"]
    assert "html" in diff["removed"]
    assert diff["changed"] == {"warc_ts": ("date", "keyword")}

    m1 = fields.read_mapping(idx)
    assert m1["version"] == 2
    # alias resolution: reads under the NEW name hit the stored field
    assert fields.resolve_field(m1, "language") == "lang"
    assert m1["fields"]["lang"]["type"] == "keyword"   # stored field intact
    assert m1["fields"]["score"]["type"] == "double"
    assert m1["fields"]["html"].get("deprecated") is True
    assert fields.resolve_field(m1, "html") is None    # deprecated -> gone
    assert m1["conflicts"]["warc_ts"] == {"stored": "date", "incoming": "keyword"}

    # idempotent: same schema again -> no diff, no version bump
    diff2 = fields.evolve_mapping(idx, evolved, renames={"lang": "language"})
    assert not any(diff2.values()) or diff2["renamed"] == {}
    assert fields.read_mapping(idx)["version"] == 2


def test_poison_doc_quarantined_not_unit_failed(spark, tmp_path):
    """Per-doc retry granularity (search_store_retrier.go:94-150): a poison
    row (null doc_id here — unreadable identity) is quarantined to the
    failed-docs sidecar with its error; the unit still COMMITS, the clean
    docs index bit-identically to a poison-free build, and resume does not
    re-fail."""
    import pandas as pd

    clean = pd.DataFrame(
        {
            "doc_id": list(range(40)),
            "text": [f"alpha beta page {i} w{i % 7}" for i in range(40)],
        }
    )
    clean_df = spark.createDataFrame(clean, "doc_id long, text string")
    poison_df = clean_df.unionByName(
        spark.createDataFrame(
            [(None, "poison row with unreadable identity")],
            "doc_id long, text string",
        )
    )

    idx_p = str(tmp_path / "poison")
    res = build.build_index(
        spark, build.docs_unit_provider(poison_df), idx_p,
        num_units=1, partitions=4, sample_fraction=1.0,
    )
    assert res["failed_units"] == []
    merge.merge_index(spark, idx_p)

    m = manifest.read_manifest(idx_p)
    assert int(m["quarantined_docs"].sum()) == 1
    assert m["status"].eq(manifest.STATUS_COMPLETED).all()
    qdir = build.quarantine_path(idx_p)
    q = spark.read.parquet(os.path.join(qdir, "unit=0")).collect()
    assert len(q) == 1
    assert q[0]["doc_id"] == -1
    assert "doc_id" in q[0]["error"]

    # clean docs are indexed bit-identically to a poison-free build
    idx_c = str(tmp_path / "clean")
    build.build_index(
        spark, build.docs_unit_provider(clean_df), idx_c,
        num_units=1, partitions=4, sample_fraction=1.0,
    )
    merge.merge_index(spark, idx_c)
    sp, sc = merge.load_stats(idx_p), merge.load_stats(idx_c)
    assert sp["n_docs"] == sc["n_docs"] == 40
    assert sp["postings_bytes"] == sc["postings_bytes"]
    a = query.search(spark, idx_p, ["alpha", "w3"], 10).collect()
    b = query.search(spark, idx_c, ["alpha", "w3"], 10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]

    # resume: the unit is committed, nothing to redo
    res2 = build.build_index(
        spark, build.docs_unit_provider(poison_df), idx_p,
        num_units=1, partitions=4, sample_fraction=1.0,
    )
    assert res2["built_units"] == [] and res2["skipped_units"] == [0]
