"""CLI surface: build → search → delta → compact through the spark-submit
entry point (pgspark_index.cli), reusing the session fixture."""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

from pgspark_index import cli, fixtures


def _run(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(argv)
    assert rc == 0
    return buf.getvalue().strip().splitlines()


def test_cli_build_search_delta_compact(spark, tmp_index, tmp_path):
    src = str(tmp_path / "webtext")
    fixtures.make_webtext_df(spark, 500, seed=61, partitions=2).write.parquet(src)

    out = _run(["build", "--input", src, "--index", tmp_index,
                "--units", "1", "--partitions", "2"])
    res = json.loads(out[-1])
    assert res["stats"]["n_docs"] > 0

    q = fixtures.make_query_set(1, seed=4)[0]
    rows = [json.loads(l) for l in _run(
        ["search", "--index", tmp_index, "--terms", *q["terms"], "-k", "5"])]
    assert 0 < len(rows) <= 5 and rows[0]["score"] >= rows[-1]["score"]

    # ranged path returns the same docs
    rows_r = [json.loads(l) for l in _run(
        ["search", "--index", tmp_index, "--terms", *q["terms"], "-k", "5",
         "--ranges", "4"])]
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == [
        (r["doc_id"], round(r["score"], 9)) for r in rows_r
    ]

    # delta + compact round-trip
    import datetime as dt

    upd = fixtures.make_webtext_pdf(500, seed=61).drop_duplicates(
        subset=["url"], keep="last").head(10).copy()
    upd["text"] = "clisentinel fresh " * 3
    upd["html"] = None
    upd["warc_ts"] = upd["warc_ts"] + dt.timedelta(days=1)
    dsrc = str(tmp_path / "delta")
    spark.createDataFrame(upd, schema=fixtures.WEBTEXT_DDL).write.parquet(dsrc)
    dres = json.loads(_run(["delta", "--input", dsrc, "--index", tmp_index,
                            "--snapshot", "1"])[-1])
    assert dres["tombstones"] == 10
    cres = json.loads(_run(["compact", "--index", tmp_index])[-1])
    assert cres["removed_docs"] == 10

    # alias resolution through the CLI
    from pgspark_index import aliases

    base = str(tmp_path / "aliasbase")
    os.makedirs(base)
    v1 = aliases.new_version(base, "web")
    os.rmdir(v1)  # publish expects a built index — reuse tmp_index
    os.symlink(tmp_index, v1)
    aliases.publish(base, "web", v1)
    rows_a = [json.loads(l) for l in _run(
        ["search", "--index-base", base, "--alias", "web",
         "--terms", *q["terms"], "-k", "5"])]
    assert {r["doc_id"] for r in rows_a}


def test_cli_prefix_wildcard_multifield_hybrid(spark, tmp_path):
    import numpy as np
    import pandas as pd

    src = str(tmp_path / "docs")
    rng = np.random.RandomState(5)
    vocab = ["apple", "apply", "appal", "fast", "fist", "feast"] + [
        f"w{i:03d}" for i in range(30)
    ]
    pdf = pd.DataFrame({
        "doc_id": np.arange(200, dtype="int64"),
        "text": [" ".join(rng.choice(vocab, size=12)) for _ in range(200)],
        "headline": [" ".join(rng.choice(vocab, size=3)) for _ in range(200)],
    })
    spark.createDataFrame(
        pdf, "doc_id long, text string, headline string"
    ).write.parquet(src)

    root = str(tmp_path / "mfidx")
    res = json.loads(_run([
        "build-multifield", "--input", src, "--index", root,
        "--fields", "body=text", "title=headline", "--units", "1",
        "--partitions", "2",
    ])[-1])
    assert set(res["field_indexes"]) == {"body", "title"}
    body = res["field_indexes"]["body"]

    rows_p = [json.loads(l) for l in _run(
        ["search", "--index", body, "--prefix", "app", "-k", "5"])]
    assert rows_p
    rows_w = [json.loads(l) for l in _run(
        ["search", "--index", body, "--wildcard", "f?st", "-k", "5"])]
    assert rows_w

    emb = pd.DataFrame({
        "vec_id": np.arange(200, dtype="int64"),
        "embedding": list(rng.randn(200, 4).astype("float64")),
    })
    esrc = str(tmp_path / "emb")
    spark.createDataFrame(emb, "vec_id long, embedding array<double>").write.parquet(esrc)
    rows_h = [json.loads(l) for l in _run(
        ["hybrid", "--index", body, "--embeddings", esrc,
         "--terms", "apple", "fast", "--vec-id", "0", "-k", "5"])]
    assert len(rows_h) == 5
    assert all(r["doc_id"] != 0 for r in rows_h)
    scores = [r["score"] for r in rows_h]
    assert scores == sorted(scores, reverse=True)


def test_cli_delta_multifield_root_search_retry(spark, tmp_path):
    import numpy as np
    import pandas as pd

    src = str(tmp_path / "docs")
    pdf = pd.DataFrame({
        "doc_id": np.arange(60, dtype="int64"),
        "text": [f"alpha base{i} w{i % 5}" for i in range(60)],
        "headline": [f"head hl{i} w{i % 3}" for i in range(60)],
    })
    spark.createDataFrame(
        pdf, "doc_id long, text string, headline string"
    ).write.parquet(src)

    root = str(tmp_path / "mfidx")
    _run(["build-multifield", "--input", src, "--index", root,
          "--fields", "body=text", "title=headline",
          "--units", "1", "--partitions", "2"])

    # one-store search through the root with a title boost
    rows = [json.loads(l) for l in _run(
        ["search", "--index-root", root, "--terms", "alpha", "head",
         "--boosts", "title=2.0", "-k", "5"])]
    assert len(rows) == 5

    # incremental multi-field delta
    dsrc = str(tmp_path / "delta")
    dpdf = pd.DataFrame({
        "doc_id": np.arange(55, 65, dtype="int64"),
        "text": [f"alpha zz7 new{i}" for i in range(10)],
        "headline": [f"newhead zz8 nh{i}" for i in range(10)],
    })
    spark.createDataFrame(
        dpdf, "doc_id long, text string, headline string"
    ).write.parquet(dsrc)
    res = json.loads(_run(
        ["delta-multifield", "--input", dsrc, "--index", root,
         "--fields", "body=text", "title=headline", "--snapshot", "1",
         "--partitions", "2"])[-1])
    assert res["tombstones"] == 5
    rows2 = [json.loads(l) for l in _run(
        ["search", "--index-root", root, "--terms", "zz7", "zz8", "-k", "20"])]
    assert {r["doc_id"] for r in rows2} == set(range(55, 65))


def test_cli_retry_quarantined(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from pgspark_index import build as _build

    full = str(tmp_path / "full")
    pdf = pd.DataFrame({
        "url": [f"https://ex.com/{i}" for i in range(50)],
        "warc_ts": pd.Timestamp("2024-01-01"),
        "html": [None] * 50,
        "text": [f"alpha page{i} w{i % 7}" + (" zmagic" if i == 9 else "")
                 for i in range(50)],
        "lang": "en",
    })
    spark.createDataFrame(pdf).write.parquet(full)

    idx = str(tmp_path / "idx")
    _run(["build", "--input", full, "--index", idx,
          "--units", "1", "--partitions", "2"])
    # simulate a build-time poison doc: url 9's doc_id quarantined
    doc9 = spark.sql(f"SELECT xxhash64('https://ex.com/9') AS id").collect()[0]["id"]
    spark.createDataFrame(
        [(int(doc9), "ValueError: synthetic")], "doc_id long, error string"
    ).write.parquet(os.path.join(_build.quarantine_path(idx), "unit=0"))

    res = json.loads(_run(
        ["retry-quarantined", "--input", full, "--index", idx,
         "--snapshot", "1"])[-1])
    assert res["retried"] == 1
    assert res["still_quarantined"] == 0


def test_cli_phrase_prefix_and_dsl(spark, tmp_path):
    import datetime as dt

    import numpy as np
    import pandas as pd

    src = str(tmp_path / "docs")
    rng = np.random.RandomState(9)
    vocab = ["table", "stream", "stack", "store", "data", "fast"] + [
        f"w{i:03d}" for i in range(20)
    ]
    texts = [" ".join(rng.choice(vocab, size=10)) for _ in range(150)]
    for i in range(0, 150, 6):
        texts[i] += " table stream"
    pdf = pd.DataFrame({
        "url": [f"https://ex.com/{i}" for i in range(150)],
        "warc_ts": [dt.datetime(2026, 1, 1)] * 150,
        "html": [None] * 150,
        "text": texts,
        "lang": ["en"] * 150,
    })
    spark.createDataFrame(pdf, schema=fixtures.WEBTEXT_DDL).write.parquet(src)

    idx = str(tmp_path / "idx")
    _run(["build", "--input", src, "--index", idx, "--units", "1",
          "--partitions", "2", "--positions"])

    rows = [json.loads(l) for l in _run(
        ["search", "--index", idx, "--phrase-prefix", "table", "st", "-k", "5"])]
    assert rows and all(r["score"] > 0 for r in rows)

    dsl = json.dumps({"bool": {
        "must": [{"term": "data"}],
        "should": [{"constant_score": {"filter": {"term": "fast"},
                                       "boost": 0.25}}],
    }})
    rows_d = [json.loads(l) for l in _run(
        ["search", "--index", idx, "--dsl", dsl, "-k", "5"])]
    assert rows_d
    scores = [r["score"] for r in rows_d]
    assert scores == sorted(scores, reverse=True)
