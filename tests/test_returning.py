"""RETURNING clause (SQLite 3.35, lang_returning.html) — write-path
differential vs live SQLite.

Every rule was probed against stdlib sqlite3 first; the differential
runner re-derives the expected RETURNING rows from live SQLite on every
run.  SQLite documents RETURNING output order as undefined, so rows are
compared as sorted multisets.  Out-of-scope forms (subqueries in
RETURNING, UPDATE ... RETURNING on a view) are pinned as loud rejects.
"""

from __future__ import annotations

import sqlite3

import pytest

from trough_spark.store import QueryRejected, SegmentStore


def _canon(rows):
    return sorted(
        sorted((k, repr(v)) for k, v in dict(r).items()) for r in rows
    )


def _run_differential(spark, tmp_path, title, ddl, stmts):
    """Execute the same script on live SQLite and the store; compare each
    statement's raise/no-raise outcome, its RETURNING rows, and the final
    table contents."""
    con = sqlite3.connect(":memory:")
    con.executescript(ddl if ddl.rstrip().endswith(";") else ddl + ";")
    sq_err, sq_ret = [], []
    for s in stmts:
        try:
            cur = con.execute(s)
            sq_err.append(None)
            if cur.description:
                cols = [c[0] for c in cur.description]
                sq_ret.append([dict(zip(cols, r)) for r in cur.fetchall()])
            else:
                sq_ret.append([])
        except sqlite3.Error as e:
            sq_err.append(str(e))
            sq_ret.append([])
    cols = [c[0] for c in con.execute("SELECT * FROM t").description]
    sq_rows = sorted(
        tuple(r[cols.index(k)] for k in sorted(cols))
        for r in con.execute("SELECT * FROM t").fetchall()
    )

    store = SegmentStore(spark, str(tmp_path / f"st_{abs(hash(title)) % 10**8}"))
    store.set_schema("s", ddl if ddl.rstrip().endswith(";") else ddl + ";")
    store.provision("seg", "s")
    en_err, en_ret = [], []
    for s in stmts:
        try:
            en_ret.append(store.write("seg", s))
            en_err.append(None)
        except QueryRejected as e:
            en_err.append(str(e))
            en_ret.append([])
    en_rows = sorted(
        tuple(d[k] for k in sorted(d))
        for d in store.read("seg", "SELECT * FROM t")
    )
    for i, (a, b) in enumerate(zip(sq_err, en_err)):
        assert (a is None) == (b is None), (
            f"{title} stmt {i}: sqlite={a!r} engine={b!r}"
        )
        assert _canon(sq_ret[i]) == _canon(en_ret[i]), (
            f"{title} stmt {i} RETURNING: sqlite={sq_ret[i]!r} "
            f"engine={en_ret[i]!r}"
        )
    assert sq_rows == en_rows, f"{title}: rows {sq_rows} vs {en_rows}"


DDL = "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER DEFAULT 7, b TEXT)"


def test_insert_returning_basic(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "insert-basic", DDL,
        [
            "INSERT INTO t (b) VALUES ('x'),('y') RETURNING id, a*2 AS d, b",
            "INSERT INTO t VALUES (10, 1, 'z') RETURNING *",
            "INSERT INTO t (b) VALUES ('k') RETURNING rowid, upper(b) AS ub",
            "INSERT INTO t (b) VALUES (' RETURNING x ') RETURNING b",
            "INSERT INTO t (a, b) VALUES (min(3, 4), 'm') RETURNING min(a, 2), max(id, a)",
            "INSERT INTO t (b) VALUES ('q') RETURNING t.id, t.b",
            "INSERT INTO t (b) VALUES ('al') RETURNING id ident, a+1 bump",
        ],
    )


def test_update_delete_returning(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "update-delete", DDL,
        [
            "INSERT INTO t VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c')",
            "UPDATE t SET a = a + 1 WHERE id <= 2 RETURNING *",
            "UPDATE t SET a = a * 2 RETURNING id, a",
            "UPDATE t SET a = 0 WHERE id > 99 RETURNING id",
            "DELETE FROM t WHERE id = 2 RETURNING b, id",
            "DELETE FROM t WHERE id > 99 RETURNING id",
            "UPDATE t SET b = b || '!' WHERE b IS NOT NULL RETURNING b",
        ],
    )


def test_conflict_forms_returning(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "conflict-forms", DDL,
        [
            "INSERT INTO t VALUES (10, 1, 'z')",
            # OR IGNORE: conflicting rows are not returned (probed)
            "INSERT OR IGNORE INTO t VALUES (10, 2, 'w'), (11, 3, 'v') RETURNING id, a",
            # DO UPDATE returns the post-update image (probed)
            "INSERT INTO t VALUES (10, 99, 'q') ON CONFLICT(id) DO UPDATE "
            "SET a = excluded.a + 100 RETURNING id, a, b",
            # DO NOTHING on conflict returns nothing (probed)
            "INSERT INTO t VALUES (10, 5, 'r') ON CONFLICT DO NOTHING RETURNING id",
            # OR REPLACE returns the new row; intra-statement duplicate pks
            # are each returned (probed — sequential application)
            "INSERT OR REPLACE INTO t VALUES (10, 6, 's') RETURNING *",
            "INSERT OR REPLACE INTO t VALUES (77, 1, 'm'), (77, 2, 'n') RETURNING id, a",
            # upsert WHERE false: row untouched, not returned (probed)
            "INSERT INTO t VALUES (10, 50, 'x') ON CONFLICT(id) DO UPDATE "
            "SET a = excluded.a WHERE 0 RETURNING *",
            "REPLACE INTO t VALUES (11, 9, 'rep') RETURNING id, a, b",
        ],
    )


def test_unique_constraint_returning(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "unique-returning",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, u TEXT UNIQUE, a INTEGER)",
        [
            "INSERT INTO t VALUES (1, 'x', 1), (2, 'y', 2)",
            # OR REPLACE resolving on the UNIQUE constraint still returns
            # the new row
            "INSERT OR REPLACE INTO t VALUES (3, 'x', 30) RETURNING id, u, a",
            "INSERT OR IGNORE INTO t VALUES (4, 'y', 40), (5, 'z', 50) RETURNING id, u",
            # upsert targeting the UNIQUE constraint
            "INSERT INTO t VALUES (6, 'z', 60) ON CONFLICT(u) DO UPDATE "
            "SET a = excluded.a RETURNING id, u, a",
            # NULL keys never conflict — both rows insert and return
            # (explicit ids: a conflict-diverted explicit id advances the
            # engine's high-water mark but not SQLite's max()+1 — the
            # documented SURVEY §7.4 AUTOINCREMENT-emulation divergence)
            "INSERT INTO t VALUES (97, NULL, 7), (98, NULL, 8) RETURNING u, a",
        ],
    )


def test_insert_select_returning(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "insert-select", DDL,
        [
            "INSERT INTO t VALUES (1, 10, 'a'), (2, 20, 'b')",
            "INSERT INTO t (a, b) SELECT a + 100, b || 's' FROM t WHERE id <= 2 "
            "RETURNING id, a, b",
        ],
    )


def test_triggered_table_returning(spark, tmp_path):
    # RETURNING values come from the row as inserted/updated, independent
    # of what the trigger bodies write (probed)
    _run_differential(
        spark, tmp_path, "triggers",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER); "
        "CREATE TABLE log (n INTEGER)",
        [
            "CREATE TRIGGER tr AFTER INSERT ON t BEGIN "
            "INSERT INTO log VALUES (NEW.a); END",
            "INSERT INTO t VALUES (1, 10), (2, 20) RETURNING id, a * 2 AS d",
            "UPDATE t SET a = a + 1 WHERE id = 1 RETURNING a",
            "DELETE FROM t WHERE id = 2 RETURNING *",
        ],
    )


def test_view_insert_delete_returning(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "view-insert",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, a TEXT); "
        "CREATE VIEW v AS SELECT * FROM t",
        [
            "CREATE TRIGGER vi INSTEAD OF INSERT ON v BEGIN "
            "INSERT INTO t VALUES (NEW.id, NEW.a); END",
            "CREATE TRIGGER vd INSTEAD OF DELETE ON v BEGIN "
            "DELETE FROM t WHERE id = OLD.id; END",
            "INSERT INTO v VALUES (9, 'z') RETURNING id, a",
            "INSERT INTO t VALUES (1, 'b')",
            "DELETE FROM v WHERE id = 9 RETURNING a",
        ],
    )


def test_without_rowid_returning(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "without-rowid",
        "CREATE TABLE t (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID",
        [
            "INSERT INTO t VALUES ('b', 1), ('a', 2) RETURNING k",
            "UPDATE t SET v = v + 1 WHERE k = 'a' RETURNING k, v",
            "DELETE FROM t WHERE k = 'b' RETURNING v",
        ],
    )


def test_returning_rejects(spark, tmp_path):
    """Out-of-scope forms reject loudly; SQLite-verbatim errors where the
    engine can produce them."""
    store = SegmentStore(spark, str(tmp_path / "rej"))
    store.set_schema(
        "s",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER);"
        "CREATE TABLE wr (k TEXT PRIMARY KEY) WITHOUT ROWID;"
        "CREATE TABLE tp (k TEXT PRIMARY KEY, v INTEGER);"
        "CREATE VIEW v AS SELECT * FROM t;"
        "CREATE TRIGGER vu INSTEAD OF UPDATE ON v BEGIN "
        "UPDATE t SET a = NEW.a WHERE id = OLD.id; END;",
    )
    store.provision("seg", "s")
    store.write("seg", "INSERT INTO t VALUES (1, 10)")
    with pytest.raises(QueryRejected, match="misuse of aggregate function count"):
        store.write("seg", "INSERT INTO t (a) VALUES (1) RETURNING count(*)")
    with pytest.raises(QueryRejected, match="misuse of aggregate function min"):
        store.write("seg", "INSERT INTO t (a) VALUES (1) RETURNING min(a)")
    with pytest.raises(QueryRejected, match="subqueries in RETURNING"):
        store.write(
            "seg",
            "INSERT INTO t (a) VALUES (1) RETURNING (SELECT max(id) FROM t)",
        )
    with pytest.raises(QueryRejected, match=r'may not use "TABLE\.\*"'):
        store.write("seg", "INSERT INTO t (a) VALUES (1) RETURNING t.*")
    with pytest.raises(QueryRejected, match="no such column: rowid"):
        store.write("seg", "INSERT INTO wr VALUES ('q') RETURNING rowid")
    # real (untracked) rowid on a non-alias pk: loud engine reject
    with pytest.raises(QueryRejected, match="rowid"):
        store.write("seg", "INSERT INTO tp VALUES ('x', 1) RETURNING rowid")
    with pytest.raises(QueryRejected, match="UPDATE .* RETURNING on a view"):
        store.write("seg", "UPDATE v SET a = 5 WHERE id = 1 RETURNING id")
    with pytest.raises(QueryRejected, match="cannot use RETURNING in a trigger"):
        store.write(
            "seg",
            "CREATE TRIGGER bad AFTER INSERT ON t BEGIN "
            "INSERT INTO t (a) VALUES (1) RETURNING id; END",
        )
    # sqlite3 errors at CREATE time too (probed)
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER)")
    with pytest.raises(sqlite3.Error, match="cannot use RETURNING in a trigger"):
        con.execute(
            "CREATE TRIGGER bad AFTER INSERT ON t BEGIN "
            "INSERT INTO t (a) VALUES (1) RETURNING id; END"
        )


def test_returning_script_rollback(spark, tmp_path):
    """A failing later statement rolls back the whole script — RETURNING
    rows from earlier statements are not delivered (the write() raises)."""
    store = SegmentStore(spark, str(tmp_path / "rb"))
    store.set_schema("s", "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER);")
    store.provision("seg", "s")
    store.write("seg", "INSERT INTO t VALUES (1, 10)")
    with pytest.raises(QueryRejected):
        store.write(
            "seg",
            "INSERT INTO t VALUES (2, 20) RETURNING id;"
            "INSERT INTO t VALUES (1, 99);",  # dup pk -> whole script fails
        )
    rows = store.read("seg", "SELECT * FROM t")
    assert [(r["id"], r["a"]) for r in rows] == [(1, 10)]


def test_returning_dbapi_fetch(spark, tmp_path):
    """PEP-249: RETURNING rows are fetchable like a SELECT's (sqlite3
    cursor semantics)."""
    from trough_spark.client import TroughClient
    from trough_spark.dbapi import TroughConnection

    client = TroughClient(spark, str(tmp_path / "dbapi"))
    client.register_schema(
        "s", "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER);"
    )
    client.store.provision("seg", "s")
    conn = TroughConnection(client, "seg", "s")
    cur = conn.cursor()
    cur.execute("INSERT INTO t (a) VALUES (5), (6) RETURNING id, a * 2")
    assert [d[0] for d in cur.description] == ["id", "a * 2"]
    assert cur.fetchall() == [(1, 10), (2, 12)]
    cur.execute("DELETE FROM t WHERE id = 1 RETURNING a")
    assert cur.fetchone() == (5,)
