"""Pin the Iceberg reader-option strings against drift.

The container has no Iceberg runtime, so sources.py's Iceberg branches are
exercised through a mocked reader that records the exact format/option/load
calls — if an option key ever drifts from the Iceberg Spark runtime's
contract (`snapshot-id`, `start-snapshot-id`, `end-snapshot-id`), these
fail without needing the runtime. The parquet-layout twin is covered by
tests/test_incremental.py; here we also pin the twin *selection* rule
(an on-disk directory always takes the parquet path, even when Iceberg
is "available")."""

from __future__ import annotations

import pytest

from pgspark_index import sources


class _Recorder:
    def __init__(self):
        self.format_name = None
        self.options: dict[str, str] = {}
        self.loaded = None
        self.sql_queries: list[str] = []


class _FakeReader:
    def __init__(self, rec: _Recorder):
        self._rec = rec

    def format(self, name):
        self._rec.format_name = name
        return self

    def option(self, k, v):
        self._rec.options[k] = v
        return self

    def load(self, table):
        self._rec.loaded = table
        return "SENTINEL_DF"


class _FakeRow(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


class _FakeSpark:
    def __init__(self, rec: _Recorder, max_snapshot=7):
        self._rec = rec
        self._max = max_snapshot

    @property
    def read(self):
        return _FakeReader(self._rec)

    def sql(self, q):
        self._rec.sql_queries.append(q)
        rec = self._rec
        max_s = self._max

        class _Res:
            def collect(self):
                return [_FakeRow(s=max_s)]

        return _Res()


@pytest.fixture(autouse=True)
def _force_iceberg(monkeypatch):
    monkeypatch.setattr(sources, "iceberg_available", lambda spark: True)


def test_read_snapshot_pins_snapshot_id_option():
    rec = _Recorder()
    df = sources.read_snapshot(_FakeSpark(rec), "cat.db.webpages", snapshot_id=42)
    assert df == "SENTINEL_DF"
    assert rec.format_name == "iceberg"
    assert rec.options == {"snapshot-id": "42"}
    assert rec.loaded == "cat.db.webpages"


def test_read_snapshot_latest_has_no_pin():
    rec = _Recorder()
    sources.read_snapshot(_FakeSpark(rec), "cat.db.webpages")
    assert rec.format_name == "iceberg"
    assert rec.options == {}


def test_incremental_read_pins_range_options():
    rec = _Recorder()
    df = sources.incremental_read(
        _FakeSpark(rec), "cat.db.webpages", start_snapshot_id=10, end_snapshot_id=20
    )
    assert df == "SENTINEL_DF"
    assert rec.format_name == "iceberg"
    assert rec.options == {"start-snapshot-id": "10", "end-snapshot-id": "20"}


def test_incremental_read_open_ended():
    rec = _Recorder()
    sources.incremental_read(_FakeSpark(rec), "cat.db.webpages", start_snapshot_id=10)
    assert rec.options == {"start-snapshot-id": "10"}


def test_latest_snapshot_id_queries_snapshots_metadata():
    rec = _Recorder()
    out = sources.latest_snapshot_id(_FakeSpark(rec), "cat.db.webpages")
    assert out == 7
    assert rec.sql_queries == [
        "SELECT max(snapshot_id) AS s FROM cat.db.webpages.snapshots"
    ]


def test_directory_path_takes_parquet_twin(tmp_path):
    """Twin selection: an on-disk directory must NEVER hit the Iceberg
    reader, even when the runtime reports available."""
    rec = _Recorder()
    d = tmp_path / "snapdir"
    (d / "snapshot=1").mkdir(parents=True)
    # the parquet branch will try a real spark.read.parquet — our fake has
    # no .parquet, so reaching the twin raises AttributeError (proof the
    # iceberg branch was NOT taken and nothing was recorded)
    with pytest.raises(AttributeError):
        sources.read_snapshot(_FakeSpark(rec), str(d), snapshot_id=1)
    assert rec.format_name is None and rec.loaded is None
