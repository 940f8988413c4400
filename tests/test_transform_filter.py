"""Transformer rule map + wildcard table filter engine (pure rule logic
plus the Spark expression form)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgspark_index import tablefilter, transformers
from pgspark_index.tablefilter import FilterConfig, find_tables, table_allowed


def test_table_filter_precedence():
    cfg = FilterConfig(
        include=["app.users", "app.*", "logs.events"],
        exclude=["app.secrets", "tmp.*"],
        schema_only=["meta"],
    )
    assert table_allowed(cfg, "app", "users")          # exact include
    assert table_allowed(cfg, "app", "orders")         # wildcard include
    assert not table_allowed(cfg, "app", "secrets")    # exclude beats include
    assert not table_allowed(cfg, "tmp", "anything")   # schema exclude
    assert table_allowed(cfg, "logs", "events")        # exact include
    assert not table_allowed(cfg, "logs", "other")     # not included
    assert not table_allowed(cfg, "meta", "tables")    # schema-only: no data

    # exact include OVERRIDES schema-only (reference precedence)
    cfg2 = FilterConfig(include=["meta.pins"], schema_only=["meta"])
    assert table_allowed(cfg2, "meta", "pins")
    assert not table_allowed(cfg2, "meta", "other")

    # *.* include
    cfg3 = FilterConfig(include=["*.*"], exclude=["x.y"])
    assert table_allowed(cfg3, "a", "b")
    assert not table_allowed(cfg3, "x", "y")

    # no include list at all -> default allow
    cfg4 = FilterConfig(exclude=["a.b"])
    assert table_allowed(cfg4, "q", "r")
    assert not table_allowed(cfg4, "a", "b")


def test_filter_expr_matches_python(spark):
    cfg = FilterConfig(
        include=["app.users", "app.*", "logs.events"],
        exclude=["app.secrets", "tmp.*"],
        schema_only=["meta"],
    )
    rows = [
        (s, t)
        for s in ("app", "logs", "tmp", "meta", "other")
        for t in ("users", "secrets", "events", "pins", "x")
    ]
    df = spark.createDataFrame(rows, "schema string, table string")
    got = {
        (r["schema"], r["table"])
        for r in tablefilter.filter_tables(df, cfg).collect()
    }
    want = {(s, t) for s, t in rows if table_allowed(cfg, s, t)}
    assert got == want


def test_find_tables_wildcards():
    cat = [("app", "users"), ("app", "orders"), ("logs", "events"), ("tmp", "x")]
    assert find_tables(cat, ["app.*"]) == [("app", "orders"), ("app", "users")]
    assert find_tables(cat, ["*.*"]) == sorted(cat)
    assert find_tables(cat, ["logs.events", "app.users"]) == [
        ("app", "users"), ("logs", "events")
    ]
    assert find_tables(cat, ["nope.*"]) == []


def test_transformers_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "alice", "alice@corp.io", "Hello  World\x00!"),
         (2, "bo", "bo@x.y", "t"),
         (3, "charlie", "charlie@corp.io", "Hello  World\x00!")],
        "id long, name string, email string, note string",
    )
    rules = {
        "name": {"type": "masking", "keep_first": 1, "keep_last": 1},
        "email": {"type": "hash_email"},
        "note": {"type": "normalize_text"},
        "id": {"type": "hash_int"},
    }
    out = {r["id"]: r for r in transformers.apply_rules(df, rules)
           .withColumn("orig", F.lit(None)).collect()}
    import hashlib

    assert out[list(out)[0]]["name"].count("*") >= 1
    a = [r for r in out.values() if r["email"].endswith("@corp.io")]
    assert len(a) == 2 and a[0]["email"] != a[1]["email"]
    assert a[0]["email"].split("@")[0] == hashlib.md5(b"alice").hexdigest()[:12] or \
           a[1]["email"].split("@")[0] == hashlib.md5(b"alice").hexdigest()[:12]
    notes = [r["note"] for r in out.values() if len(r["note"]) > 2]
    assert all(n == "hello world!" for n in notes)
    # deterministic: same input -> same output
    out2 = {r["id"]: r for r in transformers.apply_rules(df, rules).collect()}
    for k in out:
        assert out[k]["email"] == out2[k]["email"]


def test_apply_rules_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    with pytest.raises(ValueError, match="missing column"):
        transformers.apply_rules(df, {"nope": {"type": "masking"}})
    with pytest.raises(ValueError, match="unknown transformer"):
        transformers.apply_rules(df, {"v": {"type": "wat"}})
    # relaxed mode skips
    out = transformers.apply_rules(
        df, {"nope": {"type": "masking"}, "v": {"type": "wat"}}, validation="relaxed"
    )
    assert out.collect() == df.collect()


def test_generator_transformers(spark):
    """The hash-generator catalog (string / names / phone / greenmask_* /
    keyed_hash): deterministic, in-range, and in-pool."""
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta-gamma"), (3, "alpha")], "id long, v string"
    )
    rules = {
        "v": {"type": "string", "min_len": 4, "max_len": 16},
    }
    rows = transformers.apply_rules(df, rules).collect()
    by_id = {r["id"]: r["v"] for r in rows}
    assert by_id[1] == by_id[3] and by_id[1] != by_id[2]
    assert 4 <= len(by_id[1]) <= 16

    out = df.select(
        "id",
        transformers.pick(F.col("v"), transformers.FIRST_NAMES).alias("fn"),
        transformers.phone_number(F.col("v")).alias("ph"),
        transformers.greenmask_integer(F.col("v"), 10, 99).alias("gi"),
        transformers.greenmask_float(F.col("v"), 0.0, 1.0).alias("gf"),
        transformers.greenmask_uuid(F.col("v")).alias("uu"),
        transformers.greenmask_date(F.col("v")).alias("gd"),
        transformers.greenmask_utc_timestamp(F.col("v")).alias("gu"),
        transformers.keyed_hash(F.col("v"), "k").alias("kh"),
    ).collect()
    import re

    for r in out:
        assert r["fn"] in transformers.FIRST_NAMES
        assert re.fullmatch(r"\+\d{1,2}-\d{7}", r["ph"])
        assert 10 <= r["gi"] <= 99
        assert 0.0 <= r["gf"] < 1.0
        assert re.fullmatch(r"[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}", r["uu"])
        assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", r["gd"])
        assert re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", r["gu"])
        assert len(r["kh"]) == 32
    assert out[0]["kh"] == [r for r in out if r["id"] == 3][0]["kh"]


def test_json_and_map_ops(spark):
    df = spark.createDataFrame(
        [(1, '{"name":"ann","ssn":"123-45-6789","note":"hi"}'),
         (2, '{"name":"bo"}')],
        "id long, j string",
    )
    ops = {
        "ssn": {"op": "mask", "keep_first": 0, "keep_last": 4},
        "name": {"op": "hash"},
        "note": {"op": "delete"},
        "age": {"op": "set", "value": "0"},
    }
    rows = {r["id"]: r["j"] for r in transformers.apply_rules(
        df, {"j": {"type": "json", "ops": ops}}).collect()}
    import json as _json

    r1, r2 = _json.loads(rows[1]), _json.loads(rows[2])
    assert r1["ssn"] == "*******6789"
    assert len(r1["name"]) == 32 and "note" not in r1
    assert r1["age"] == "0" and r2["age"] == "0"  # set upserts missing keys


def test_encrypted_aes_roundtrip(spark):
    key = "0123456789abcdef"
    df = spark.createDataFrame([(1, "secret value")], "id long, v string")
    enc = transformers.apply_rules(df, {"v": {"type": "encrypted_aes", "key": key}})
    out = enc.withColumn(
        "dec",
        F.aes_decrypt(F.unbase64("v"), F.lit(key), F.lit("ECB")).cast("string"),
    ).collect()[0]
    assert out["v"] != "secret value" and out["dec"] == "secret value"
    # deterministic (the SIV property): same plaintext+key -> same token
    assert enc.collect()[0]["v"] == out["v"]


def test_bare_scan_files_gate(spark, tmp_path):
    """bare_scan_files (public sameSemantics API, no _jdf): a plain parquet
    scan qualifies for file-subset salt sampling; anything with a filter,
    projection, or derived column falls back (their semantics would be
    silently dropped by re-reading raw files)."""
    from pyspark.sql import functions as F

    from pgspark_index import build, fixtures

    p = str(tmp_path / "t")
    fixtures.make_webtext_df(spark, 200, seed=3, partitions=4).write.mode(
        "overwrite"
    ).parquet(p)
    df = spark.read.parquet(p)
    assert len(build.bare_scan_files(df)) > 0
    assert build.bare_scan_files(df.filter(F.col("lang") == "en")) == []
    assert build.bare_scan_files(df.select("url", "text")) == []
    assert build.bare_scan_files(df.withColumn("x", F.lit(1))) == []
    assert build.bare_scan_files(
        spark.createDataFrame([(1,)], "a int")
    ) == []
