"""Continuous indexing: streaming checkpoint = the replication-slot ack.

A second availableNow run with the same checkpoint must process ONLY files
that arrived after the first run (exactly-once over the source), and the
index must reflect the latest version of every url."""

import os

import pytest

from pgspark_index import fixtures, manifest, merge, query, streaming


@pytest.mark.filterwarnings("ignore")
def test_streaming_incremental_indexing(spark, tmp_index, tmp_path):
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    base = fixtures.make_webtext_pdf(200, seed=3).drop_duplicates(subset=["url"], keep="last")
    spark.createDataFrame(base, schema=fixtures.WEBTEXT_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)

    q = streaming.start_continuous_indexing(
        spark, input_dir, tmp_index, ckpt, partitions=4, sample_fraction=1.0
    )
    q.awaitTermination(120)
    n_after_first = merge.load_stats(tmp_index)["n_docs"]
    assert n_after_first == len(base)
    units_first = manifest.completed_units(tmp_index)

    # new file arrives: 20 updated urls with sentinel content
    upd = base.head(20).copy()
    upd["text"] = "streamsentinel only " * 3
    upd["html"] = None
    import datetime as dt

    upd["warc_ts"] = upd["warc_ts"] + dt.timedelta(days=9)
    spark.createDataFrame(upd, schema=fixtures.WEBTEXT_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)

    q2 = streaming.start_continuous_indexing(
        spark, input_dir, tmp_index, ckpt, partitions=4, sample_fraction=1.0
    )
    q2.awaitTermination(120)

    # only the new file was processed (units added for exactly one epoch)
    new_units = manifest.completed_units(tmp_index) - units_first
    assert len(new_units) == 1

    hits = query.search(spark, tmp_index, ["streamsentinel"], 50).collect()
    assert len(hits) == 20


@pytest.mark.filterwarnings("ignore")
def test_stateful_lww_stream(spark, tmp_path):
    """applyInPandasWithState LWW: emits a url only when its winner
    changes; state survives a checkpointed restart, so a replayed older
    version emits nothing."""
    import datetime as dt

    import pandas as pd

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
        spark.createDataFrame(pdf, schema=fixtures.WEBTEXT_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)

    def run_once():
        stream = spark.readStream.schema(fixtures.WEBTEXT_DDL).parquet(input_dir)
        q = (
            streaming.stateful_lww_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch(
        [
            ("u1", t0, None, "v1 of u1", "en"),
            ("u2", t0, None, "v1 of u2", "en"),
            ("u1", t0 + dt.timedelta(minutes=1), None, "v2 of u1", "en"),
        ]
    )
    run_once()
    first = {
        r["url"]: r["text"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert first == {"u1": "v2 of u1", "u2": "v1 of u2"}

    # restart with the same checkpoint: a NEWER u2 emits, an OLDER
    # (replayed) u1 is suppressed by the persisted state
    write_batch(
        [
            ("u2", t0 + dt.timedelta(minutes=5), None, "v2 of u2", "en"),
            ("u1", t0, None, "v1 of u1 replay", "en"),
        ]
    )
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 3  # exactly one new emission
    latest_u2 = [r["text"] for r in rows if r["url"] == "u2"]
    assert sorted(latest_u2) == ["v1 of u2", "v2 of u2"]
    assert [r["text"] for r in rows if r["url"] == "u1"] != ["v1 of u1 replay"]
