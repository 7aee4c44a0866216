"""Distributed SQLite-shard reader/writer: the migration path from a real
trough deployment's segment files (FIXTURES F1/F6 shapes)."""

from __future__ import annotations

import sqlite3

import pyspark.sql.types as T
import pytest

from trough_spark.sources.sqlite import (
    export_segment_sqlite,
    import_sqlite_segment,
    list_sqlite_tables,
    read_sqlite_shards,
    sqlite_table_schema,
)
from trough_spark.store import SegmentStore


@pytest.fixture()
def shard_files(tmp_path):
    """16 trough-style shards with the F1 schema + a rows table."""
    paths = {}
    for i in range(16):
        p = str(tmp_path / f"seg{i:02d}.sqlite")
        conn = sqlite3.connect(p)
        conn.execute(
            "CREATE TABLE test (id INTEGER PRIMARY KEY AUTOINCREMENT, test varchar(4))"
        )
        conn.executemany(
            "INSERT INTO test (test) VALUES (?)", [(f"v{i}_{j}",) for j in range(10)]
        )
        conn.commit()
        conn.close()
        paths[f"seg{i:02d}"] = p
    return paths


def test_schema_inference(shard_files):
    p = next(iter(shard_files.values()))
    assert list_sqlite_tables(p) == ["test"]
    schema = sqlite_table_schema(p, "test")
    assert [(f.name, f.dataType.simpleString()) for f in schema.fields] == [
        ("id", "bigint"),
        ("test", "string"),
    ]


def test_distributed_shard_read(spark, shard_files):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("test", T.StringType())]
    )
    df = read_sqlite_shards(spark, shard_files, "test", schema)
    assert df.count() == 160
    # one global query over all shards — per-segment grouping preserved
    per_seg = {r["segment_id"]: r["n"] for r in df.groupBy("segment_id").count().withColumnRenamed("count", "n").collect()}
    assert per_seg == {f"seg{i:02d}": 10 for i in range(16)}
    one = df.filter("segment_id = 'seg03' AND id = 1").collect()
    assert one[0]["test"] == "v3_0"


def test_import_then_query_via_store(spark, tmp_path, shard_files):
    store = SegmentStore(spark, str(tmp_path / "store"))
    import_sqlite_segment(store, "seg00", shard_files["seg00"])
    rows = store.read("seg00", "SELECT count(*) AS n, min(test) AS first FROM test")
    assert rows == [{"n": 10, "first": "v0_0"}]


def test_export_roundtrip(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("s", "create table kv (k INTEGER, v TEXT);")
    store.provision("exp", "s")
    store.write("exp", "INSERT INTO kv (k, v) VALUES (1, 'a'), (2, 'b');")
    out = export_segment_sqlite(store, "exp", str(tmp_path / "exp.sqlite"))
    conn = sqlite3.connect(out)
    assert conn.execute("SELECT k, v FROM kv ORDER BY k").fetchall() == [(1, "a"), (2, "b")]
    conn.close()
