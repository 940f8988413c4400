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
