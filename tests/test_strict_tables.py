"""STRICT tables (SQLite 3.37, stricttables.html) — differential vs live
SQLite.  The engine's declared-schema model makes STRICT its closest
SQLite mode: type names are restricted at DDL time and value storage is
enforced with the probed lossless-coercion rules and verbatim errors.
ANY columns are the one documented reject (a declared-schema engine has
no untyped storage class)."""

from __future__ import annotations

import sqlite3

import pytest

from trough_spark.store import QueryRejected, SegmentStore

DDL = (
    "CREATE TABLE t (id INTEGER PRIMARY KEY, i INTEGER, r REAL, s TEXT) STRICT"
)


def _run(spark, tmp_path, title, stmts, ddl=DDL):
    con = sqlite3.connect(":memory:")
    con.executescript(ddl + ";")
    sq_err = []
    for st in stmts:
        try:
            con.execute(st)
            sq_err.append(None)
        except sqlite3.Error as e:
            sq_err.append(str(e))
    sq_rows = sorted(
        (tuple(r) for r in con.execute("SELECT * FROM t").fetchall()), key=repr
    )
    store = SegmentStore(spark, str(tmp_path / f"st_{abs(hash(title)) % 10**8}"))
    store.set_schema("s", ddl + ";")
    store.provision("seg", "s")
    en_err = []
    for st in stmts:
        try:
            store.write("seg", st)
            en_err.append(None)
        except QueryRejected as e:
            en_err.append(str(e))
    en_rows = sorted(
        (tuple(d.values()) for d in store.read("seg", "SELECT * FROM t")),
        key=repr,
    )
    for i, (a, b) in enumerate(zip(sq_err, en_err)):
        assert (a is None) == (b is None), (
            f"{title} stmt {i}: sqlite={a!r} engine={b!r}"
        )
        if a is not None and "cannot store" in a:
            # the storage errors are SQLite-verbatim
            assert a == b, f"{title} stmt {i}: {a!r} vs {b!r}"
    assert sq_rows == en_rows, f"{title}: {sq_rows} vs {en_rows}"


def test_strict_insert_enforcement(spark, tmp_path):
    _run(
        spark, tmp_path, "insert",
        [
            "INSERT INTO t (id, i) VALUES (1, 'abc')",       # TEXT -> INTEGER
            "INSERT INTO t (id, i) VALUES (1, '123')",       # lossless, ok
            "INSERT INTO t (id, i) VALUES (2, 1.5)",         # REAL -> INTEGER
            "INSERT INTO t (id, i) VALUES (2, 2.0)",         # integral, ok
            "INSERT INTO t (id, i) VALUES (3, ' 12 ')",      # padded, ok
            "INSERT INTO t (id, i) VALUES (4, '0x10')",      # not numeric
            "INSERT INTO t (id, i) VALUES (4, '12.5')",      # REAL via string
            "INSERT INTO t (id, r) VALUES (5, 7)",           # int -> REAL, ok
            "INSERT INTO t (id, r) VALUES (6, '4.5')",       # numstr, ok
            "INSERT INTO t (id, r) VALUES (7, 'x')",         # TEXT -> REAL
            "INSERT INTO t (id, s) VALUES (8, 42)",          # int -> TEXT, ok
            "INSERT INTO t (id, s) VALUES (9, 4.5)",         # real -> TEXT, ok
        ],
    )


def test_strict_update_and_insert_select(spark, tmp_path):
    _run(
        spark, tmp_path, "update",
        [
            "INSERT INTO t (id, i, s) VALUES (1, 10, '77'), (2, 20, 'abc')",
            "UPDATE t SET i = 'zz' WHERE id = 1",            # TEXT -> INTEGER
            "UPDATE t SET i = i + 1 WHERE id = 1",           # ok
            "UPDATE t SET r = i WHERE id = 2",               # int -> REAL ok
            "UPDATE t SET i = s WHERE id = 1",               # '77' lossless ok
            "UPDATE t SET i = s WHERE id = 2",               # 'abc' raises
            # INSERT..SELECT with a text source into INTEGER: per-value
            "INSERT INTO t (id, i) SELECT id + 10, s FROM t WHERE id = 1",
            "INSERT INTO t (id, i) SELECT id + 20, s FROM t WHERE id = 2",
        ],
    )


def test_strict_conflict_forms(spark, tmp_path):
    _run(
        spark, tmp_path, "conflict",
        [
            "INSERT INTO t (id, i) VALUES (1, 10)",
            "INSERT OR REPLACE INTO t (id, i) VALUES (1, '30')",   # lossless
            "INSERT OR IGNORE INTO t (id, i) VALUES (1, 99), (2, '5')",
            "INSERT INTO t (id, i) VALUES (1, 7) "
            "ON CONFLICT(id) DO UPDATE SET i = excluded.i + 0.5",  # REAL
            "INSERT INTO t (id, i) VALUES (1, 7) "
            "ON CONFLICT(id) DO UPDATE SET i = excluded.i + 1",    # ok
        ],
    )


def test_strict_ddl_rules(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "ddl"))
    con = sqlite3.connect(":memory:")
    for ddl, msg in [
        ("CREATE TABLE a1 (x VARCHAR(10)) STRICT;",
         'unknown datatype for a1.x: "VARCHAR(10)"'),
        ("CREATE TABLE a2 (x) STRICT;", "missing datatype for a2.x"),
    ]:
        with pytest.raises(sqlite3.Error):
            con.execute(ddl.rstrip(";"))
        with pytest.raises(QueryRejected) as ei:
            store.set_schema("bad", ddl)
        assert msg in str(ei.value)
    # ANY: legal in SQLite, documented loud reject here
    con.execute("CREATE TABLE a3 (x ANY) STRICT")
    with pytest.raises(QueryRejected, match="ANY column"):
        store.set_schema("bad", "CREATE TABLE a3 (x ANY) STRICT;")
    # STRICT pk is implicitly NOT NULL (non-alias pk shapes)
    store.set_schema(
        "sp", "CREATE TABLE t (k TEXT PRIMARY KEY, v INTEGER) STRICT;"
    )
    store.provision("segp", "sp")
    with pytest.raises(QueryRejected, match="NOT NULL constraint failed: t.k"):
        store.write("segp", "INSERT INTO t (v) VALUES (1)")
    # ... while an INTEGER pk stays the auto-assigning rowid alias
    store.set_schema(
        "si", "CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER) STRICT;"
    )
    store.provision("segi", "si")
    store.write("segi", "INSERT INTO t (v) VALUES (5)")
    assert store.read("segi", "SELECT id, v FROM t") == [{"id": 1, "v": 5}]
    # ALTER ADD COLUMN type rules apply on strict tables
    with pytest.raises(QueryRejected, match="unknown datatype"):
        store.write("segi", "ALTER TABLE t ADD COLUMN z VARCHAR(4)")
    # STRICT combines with WITHOUT ROWID
    store.set_schema(
        "swr",
        "CREATE TABLE t (k TEXT PRIMARY KEY, v INTEGER) STRICT, WITHOUT ROWID;",
    )
    store.provision("segw", "swr")
    store.write("segw", "INSERT INTO t VALUES ('a', 1)")
    with pytest.raises(QueryRejected, match="cannot store TEXT value"):
        store.write("segw", "INSERT INTO t VALUES ('b', 'xx')")


def test_strict_returning_and_blob(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "blob"))
    store.set_schema(
        "s",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, b BLOB, i INTEGER) STRICT;",
    )
    store.provision("seg", "s")
    out = store.write(
        "seg", "INSERT INTO t (id, b, i) VALUES (1, x'4142', '7') RETURNING i"
    )
    assert out == [{"i": 7}]  # '7' coerced losslessly, returned as INTEGER
    with pytest.raises(QueryRejected, match="cannot store INT value in BLOB"):
        store.write("seg", "INSERT INTO t (id, b) VALUES (2, 9)")
    rows = store.read("seg", "SELECT b FROM t")
    assert rows[0]["b"] == bytearray(b"AB")
