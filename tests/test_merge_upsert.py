"""SQLite ON CONFLICT upsert, the merge() API, and INFILE INTO data loads."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trough_spark.dialect import QueryRejected
from trough_spark.store import SegmentStore


@pytest.fixture()
def store(spark, tmp_path):
    st = SegmentStore(spark, str(tmp_path / "store"))
    st.set_schema(
        "s",
        "CREATE TABLE kv (k INTEGER PRIMARY KEY, v VARCHAR, cnt INTEGER);",
    )
    st.provision("seg", "s")
    st.write("seg", "INSERT INTO kv (k, v, cnt) VALUES (1,'a',10),(2,'b',20);")
    return st


def _rows(st, seg="seg"):
    return {
        r["k"]: (r["v"], r["cnt"])
        for r in st.read(seg, "SELECT k, v, cnt FROM kv;")
    }


def test_on_conflict_do_nothing(store):
    store.write(
        "seg",
        "INSERT INTO kv (k, v, cnt) VALUES (1,'X',99),(3,'c',30) "
        "ON CONFLICT (k) DO NOTHING;",
    )
    assert _rows(store) == {1: ("a", 10), 2: ("b", 20), 3: ("c", 30)}


def test_on_conflict_do_update_with_excluded(store):
    store.write(
        "seg",
        "INSERT INTO kv (k, v, cnt) VALUES (1,'A',5),(3,'c',30) "
        "ON CONFLICT (k) DO UPDATE SET v = excluded.v, cnt = cnt + excluded.cnt;",
    )
    # k=1 conflicts: v replaced, cnt = 10+5; k=3 inserts
    assert _rows(store) == {1: ("A", 15), 2: ("b", 20), 3: ("c", 30)}


def test_on_conflict_do_update_where(store):
    store.write(
        "seg",
        "INSERT INTO kv (k, v, cnt) VALUES (1,'A',5),(2,'B',5) "
        "ON CONFLICT (k) DO UPDATE SET v = excluded.v WHERE cnt < 15;",
    )
    # only k=1 (cnt 10 < 15) updates; k=2 (cnt 20) keeps its row
    assert _rows(store) == {1: ("A", 10), 2: ("b", 20)}


def test_on_conflict_rejections(store):
    with pytest.raises(QueryRejected):
        store.write(
            "seg",
            "INSERT OR REPLACE INTO kv (k,v,cnt) VALUES (1,'x',1) "
            "ON CONFLICT (k) DO NOTHING;",
        )
    with pytest.raises(QueryRejected):
        store.write(
            "seg",
            "INSERT INTO kv (k,v,cnt) VALUES (1,'x',1) "
            "ON CONFLICT (v) DO NOTHING;",
        )
    # the SQLite-3.35 catch-all form (no conflict target) is LEGAL for
    # DO UPDATE and resolves pk-first (probed round 8; this was a reject
    # before the UNIQUE-constraints work widened upsert-target support)
    store.write(
        "seg",
        "INSERT INTO kv (k,v,cnt) VALUES (1,'x',1) "
        "ON CONFLICT DO UPDATE SET v='x';",
    )
    assert _rows(store)[1] == ("x", 10)


def test_merge_update_insert(store, spark):
    src = spark.createDataFrame(
        [(2, "B2", 200), (4, "d", 40)], "k int, v string, cnt int"
    )
    res = store.merge("seg", "kv", src)
    assert res == {"matched": 1, "inserted": 1}
    assert _rows(store) == {1: ("a", 10), 2: ("B2", 200), 4: ("d", 40)}


def test_merge_expression_and_ignore_insert(store, spark):
    src = spark.createDataFrame(
        [(1, 7), (9, 1)], "k int, cnt int"
    )
    res = store.merge(
        "seg",
        "kv",
        src,
        when_matched={"cnt": "target.cnt + source.cnt"},
        when_not_matched="ignore",
    )
    assert res == {"matched": 1, "inserted": 0}
    assert _rows(store) == {1: ("a", 17), 2: ("b", 20)}


def test_merge_partial_source_columns_insert_null(store, spark):
    src = spark.createDataFrame([(5, 50)], "k int, cnt int")
    store.merge("seg", "kv", src)
    assert _rows(store)[5] == (None, 50)


def test_merge_duplicate_source_keys_last_wins(store, spark):
    src = spark.createDataFrame(
        [(3, "first", 1), (3, "last", 2)], "k int, v string, cnt int"
    )
    store.merge("seg", "kv", src)
    assert _rows(store)[3] == ("last", 2)


def test_merge_requires_keys(store, spark):
    src = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(QueryRejected):
        store.merge("seg", "kv", src)  # no key column in source


def test_infile_into_loads_csv_with_inferred_schema(spark, tmp_path):
    from trough_spark.client import TroughClient
    from trough_spark.shell import TroughShell

    client = TroughClient(spark, str(tmp_path / "store"))
    st = client.store
    st.set_schema("s", "CREATE TABLE t0 (a INTEGER);")
    st.provision("seg", "s")
    csv = tmp_path / "data.csv"
    csv.write_text("id,name,score\n1,ann,1.5\n2,bo,2.5\n")
    sh = TroughShell(client)
    sh.connections = ["seg"]
    out = []
    sh.emit = out.append
    sh.do_line(f"INFILE {csv} INTO people")
    assert any("OK (2 rows into people)" in o for o in out), out
    rows = st.read("seg", "SELECT id, name, score FROM people ORDER BY id;")
    assert [tuple(r.values()) for r in rows] == [(1, "ann", 1.5), (2, "bo", 2.5)]


def test_infile_into_parquet_roundtrip(spark, tmp_path):
    from trough_spark.client import TroughClient
    from trough_spark.shell import TroughShell

    client = TroughClient(spark, str(tmp_path / "store"))
    st = client.store
    st.set_schema("s", "CREATE TABLE t0 (a INTEGER);")
    st.provision("seg", "s")
    pq = str(tmp_path / "data.parquet")
    spark.range(5).select("id", (F.col("id") * 2).alias("dbl")).write.parquet(pq)
    sh = TroughShell(client)
    sh.connections = ["seg"]
    out = []
    sh.emit = out.append
    sh.do_line(f"INFILE {pq} INTO nums")
    assert any("OK (5 rows into nums)" in o for o in out), out
    rows = st.read("seg", "SELECT COUNT(*) AS n, SUM(dbl) AS s FROM nums;")
    assert rows[0]["n"] == 5 and rows[0]["s"] == 20


def test_infile_missing_file_reports_error(spark, tmp_path):
    from trough_spark.client import TroughClient
    from trough_spark.shell import TroughShell

    client = TroughClient(spark, str(tmp_path / "store"))
    st = client.store
    st.set_schema("s", "CREATE TABLE t0 (a INTEGER);")
    st.provision("seg", "s")
    sh = TroughShell(client)
    sh.connections = ["seg"]
    out = []
    sh.emit = out.append
    sh.do_line(f"INFILE {tmp_path}/nope.csv INTO x")
    assert any(o.startswith("error:") for o in out), out
