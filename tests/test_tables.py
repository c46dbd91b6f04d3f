"""Snapshot-source dispatch gates: the Iceberg branch (stubbed runtime — none
ships in this sandbox) must build a time-travel read with the right option for
snapshot-id vs tag, and the parquet fallback must stay a plain read."""

import pytest

from video_features_spark.sources import tables


class _FakeReader:
    def __init__(self):
        self.fmt = None
        self.options = {}
        self.loaded = None

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self, path):
        self.loaded = path
        return "ICEBERG_DF"


class _FakeSpark:
    def __init__(self):
        self.read = _FakeReader()


def test_read_snapshot_iceberg_numeric_pins_snapshot_id(monkeypatch):
    monkeypatch.setattr(tables, "has_iceberg", lambda spark: True)
    fs = _FakeSpark()
    out = tables.read_snapshot(fs, "db.features", snapshot_id=123456789)
    assert out == "ICEBERG_DF"
    assert fs.read.fmt == "iceberg"
    assert fs.read.options == {"snapshot-id": "123456789"}
    assert fs.read.loaded == "db.features"


def test_read_snapshot_iceberg_string_pins_tag(monkeypatch):
    monkeypatch.setattr(tables, "has_iceberg", lambda spark: True)
    fs = _FakeSpark()
    tables.read_snapshot(fs, "db.features", snapshot_id="v2024-01")
    assert fs.read.options == {"tag": "v2024-01"}


def test_read_snapshot_iceberg_unpinned_reads_head(monkeypatch):
    monkeypatch.setattr(tables, "has_iceberg", lambda spark: True)
    fs = _FakeSpark()
    tables.read_snapshot(fs, "db.features")
    assert fs.read.fmt == "iceberg" and fs.read.options == {}


def test_read_snapshot_parquet_fallback(spark, sf_dir):
    assert tables.has_iceberg(spark) is False  # sandbox ships no runtime
    df = tables.read_snapshot(spark, f"{sf_dir}/events.parquet", snapshot_id=1)
    assert df.count() == 1000


def test_load_table_rejects_unknown(spark):
    with pytest.raises(KeyError):
        tables.load_table(spark, "not_a_table")
