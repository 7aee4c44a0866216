"""UNIQUE constraints and key collations (round 8): write-path differential
vs live SQLite.

Until round 8 the engine enforced only the binary PRIMARY KEY — UNIQUE
columns/constraints were silently unenforced and a `COLLATE NOCASE` pk
accepted case-variant duplicates (both found by live probing).  Every rule
asserted here was probed against stdlib sqlite3 first; the differential
runner below re-derives the expected outcome from live SQLite on every run
so drift in either engine is caught.
"""

from __future__ import annotations

import sqlite3

import pytest

from trough_spark.store import QueryRejected, SegmentStore


def _run_differential(spark, tmp_path, title, ddl, stmts):
    """Run the same script against live SQLite and the store; compare
    error positions and final table contents."""
    con = sqlite3.connect(":memory:")
    for d in ddl.strip().rstrip(";").split(";"):
        con.execute(d)
    sq_err = []
    for s in stmts:
        try:
            con.execute(s)
            sq_err.append(None)
        except sqlite3.Error as e:
            sq_err.append(str(e))
    cols = [c[0] for c in con.execute("SELECT * FROM t").description]
    sq_rows = sorted(
        tuple(r[cols.index(k)] for k in sorted(cols))
        for r in con.execute("SELECT * FROM t").fetchall()
    )

    store = SegmentStore(spark, str(tmp_path / f"st_{abs(hash(title)) % 10**8}"))
    store.set_schema("s", ddl if ddl.rstrip().endswith(";") else ddl + ";")
    store.provision("seg", "s")
    en_err = []
    for s in stmts:
        try:
            store.write("seg", s)
            en_err.append(None)
        except QueryRejected as e:
            en_err.append(str(e))
    en_rows = sorted(
        tuple(d[k] for k in sorted(d))
        for d in store.read("seg", "SELECT * FROM t")
    )
    for i, (a, b) in enumerate(zip(sq_err, en_err)):
        assert (a is None) == (b is None), (
            f"{title} stmt {i}: sqlite={a!r} engine={b!r}"
        )
    assert sq_rows == en_rows, f"{title}: rows {sq_rows} vs {en_rows}"


CASES = [
    (
        "unique column plain insert raises",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, u TEXT UNIQUE)",
        ["INSERT INTO t VALUES (1,'x')", "INSERT INTO t VALUES (2,'x')",
         "INSERT INTO t VALUES (3,NULL)", "INSERT INTO t VALUES (4,NULL)"],
    ),
    (
        "nocase pk conflicts case-insensitively",
        "CREATE TABLE t (name TEXT PRIMARY KEY COLLATE NOCASE, v INT)",
        ["INSERT INTO t VALUES ('Alpha',1)", "INSERT INTO t VALUES ('alpha',2)",
         "INSERT INTO t VALUES ('beta',3)"],
    ),
    (
        "table-level multi-column unique",
        "CREATE TABLE t (a INT, b INT, UNIQUE (a, b))",
        ["INSERT INTO t VALUES (1,1)", "INSERT INTO t VALUES (1,2)",
         "INSERT INTO t VALUES (1,1)"],
    ),
    (
        "pk-clause collate overrides binary column",
        "CREATE TABLE t (a TEXT, v INT, PRIMARY KEY (a COLLATE NOCASE))",
        ["INSERT INTO t VALUES ('X',1)", "INSERT INTO t VALUES ('x',2)"],
    ),
    (
        "rtrim unique folds trailing spaces only",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, u TEXT UNIQUE COLLATE RTRIM)",
        ["INSERT INTO t VALUES (1,'a')", "INSERT INTO t VALUES (2,'a  ')",
         "INSERT INTO t VALUES (3,'a\t')"],
    ),
    (
        "or replace cascades across all constraints",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE, v INT)",
        ["INSERT INTO t VALUES (1,'x',10)", "INSERT INTO t VALUES (2,'y',20)",
         "INSERT OR REPLACE INTO t VALUES (1,'y',30)"],
    ),
    (
        "or replace sequential within one statement",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE)",
        ["INSERT INTO t VALUES (1,'x')",
         "INSERT OR REPLACE INTO t VALUES (2,'x'), (3,'x')"],
    ),
    (
        "or ignore skips unique conflicts per row",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE)",
        ["INSERT INTO t VALUES (1,'x')",
         "INSERT OR IGNORE INTO t VALUES (2,'x'), (3,'z')"],
    ),
    (
        "or replace on pk-less table resolves on unique",
        "CREATE TABLE t (a INT UNIQUE, b TEXT)",
        ["INSERT INTO t VALUES (1,'x')", "INSERT OR REPLACE INTO t VALUES (1,'y')"],
    ),
    (
        "do nothing with target skips on target",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE)",
        ["INSERT INTO t VALUES (1,'x')",
         "INSERT INTO t VALUES (1,'x') ON CONFLICT(a) DO NOTHING"],
    ),
    (
        "do nothing with target raises on other constraint",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE)",
        ["INSERT INTO t VALUES (1,'x')",
         "INSERT INTO t VALUES (2,'x') ON CONFLICT(a) DO NOTHING"],
    ),
    (
        "do nothing without target skips on any",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE)",
        ["INSERT INTO t VALUES (1,'x')",
         "INSERT INTO t VALUES (2,'x') ON CONFLICT DO NOTHING",
         "INSERT INTO t VALUES (1,'z') ON CONFLICT DO NOTHING"],
    ),
    (
        "do update on unique target",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE, n INT DEFAULT 0)",
        ["INSERT INTO t VALUES (1,'x',0)",
         "INSERT INTO t (a,b) VALUES (5,'x') ON CONFLICT(b) DO UPDATE SET n = n + 1",
         "INSERT INTO t (a,b) VALUES (1,'q') ON CONFLICT(b) DO UPDATE SET n = n + 1"],
    ),
    (
        "do update set creating third-row conflict raises",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE)",
        ["INSERT INTO t VALUES (1,'x')", "INSERT INTO t VALUES (2,'y')",
         "INSERT INTO t VALUES (1,'z') ON CONFLICT(a) DO UPDATE SET b='y'"],
    ),
    (
        "catch-all do update (sqlite 3.35 form)",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE, n INT DEFAULT 0)",
        ["INSERT INTO t VALUES (1,'x',0)",
         "INSERT INTO t VALUES (2,'x',0) ON CONFLICT DO UPDATE SET n = n + 1"],
    ),
    (
        "two-row catch-all updates the pk-first hit",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE, n INT DEFAULT 0)",
        ["INSERT INTO t VALUES (1,'x',0)", "INSERT INTO t VALUES (2,'y',0)",
         "INSERT INTO t VALUES (1,'y',0) ON CONFLICT DO UPDATE SET n = n + 1"],
    ),
    (
        "target not matching any constraint rejected",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE, c INT)",
        ["INSERT INTO t VALUES (1,'x',0)",
         "INSERT INTO t VALUES (2,'y',0) ON CONFLICT(c) DO NOTHING"],
    ),
    (
        "upsert clause on constraint-free table is plain insert",
        "CREATE TABLE t (a INT, b TEXT)",
        ["INSERT INTO t VALUES (1,'x') ON CONFLICT DO NOTHING",
         "INSERT INTO t VALUES (1,'x') ON CONFLICT DO UPDATE SET b='y'"],
    ),
    (
        "plain update violating unique raises",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE)",
        ["INSERT INTO t VALUES (1,'x')", "INSERT INTO t VALUES (2,'y')",
         "UPDATE t SET b='x' WHERE a=2"],
    ),
    (
        "plain update violating nocase unique raises",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE COLLATE NOCASE)",
        ["INSERT INTO t VALUES (1,'Xy')", "INSERT INTO t VALUES (2,'zz')",
         "UPDATE t SET b='xY' WHERE a=2"],
    ),
    (
        "nocase unique: or ignore",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE COLLATE NOCASE)",
        ["INSERT INTO t VALUES (1,'Xy')",
         "INSERT OR IGNORE INTO t VALUES (2,'xY'), (3,'zz')"],
    ),
    (
        "pk conflict error names pk even when unique also conflicts",
        "CREATE TABLE t (b TEXT UNIQUE, a INTEGER PRIMARY KEY)",
        ["INSERT INTO t VALUES ('x',1)", "INSERT INTO t VALUES ('x',1)"],
    ),
    (
        "insert..select respects unique",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE);"
        "CREATE TABLE src (x INT, y TEXT)",
        ["INSERT INTO src VALUES (9,'x')", "INSERT INTO t VALUES (1,'x')",
         "INSERT INTO t SELECT x, y FROM src"],
    ),
    (
        "insert..select or ignore respects unique",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE);"
        "CREATE TABLE src (x INT, y TEXT)",
        ["INSERT INTO src VALUES (9,'x')", "INSERT INTO src VALUES (10,'z')",
         "INSERT INTO t VALUES (1,'x')",
         "INSERT OR IGNORE INTO t SELECT x, y FROM src"],
    ),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0].replace(" ", "_") for c in CASES])
def test_unique_constraints_match_sqlite(spark, tmp_path, case):
    _run_differential(spark, tmp_path, *case)


def test_unknown_collation_rejected_at_ddl(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "st"))
    with pytest.raises(QueryRejected, match="no such collation sequence: WAT"):
        store.set_schema("s", "CREATE TABLE t (a TEXT COLLATE WAT);")


def test_schema_level_unique_index_enforced(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "st"))
    store.set_schema(
        "s",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT);\n"
        "CREATE UNIQUE INDEX iu ON t (b COLLATE NOCASE);",
    )
    store.provision("seg", "s")
    store.write("seg", "INSERT INTO t VALUES (1,'Xy')")
    with pytest.raises(QueryRejected, match="UNIQUE constraint failed: t.b"):
        store.write("seg", "INSERT INTO t VALUES (2,'xY')")
    with pytest.raises(QueryRejected, match="schema-level UNIQUE INDEX"):
        store.write("seg", "DROP INDEX iu")


def test_write_path_unique_index_lifecycle(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "st"))
    store.set_schema("s", "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT);")
    store.provision("seg", "s")
    store.write("seg", "INSERT INTO t VALUES (1,'x'), (2,'x')")
    # over existing duplicates: fails like SQLite
    with pytest.raises(QueryRejected, match="UNIQUE constraint failed: t.b"):
        store.write("seg", "CREATE UNIQUE INDEX iu ON t (b)")
    store.write("seg", "DELETE FROM t WHERE a = 2")
    store.write("seg", "CREATE UNIQUE INDEX iu ON t (b)")
    with pytest.raises(QueryRejected, match="UNIQUE constraint failed: t.b"):
        store.write("seg", "INSERT INTO t VALUES (3,'x')")
    # constraint survives a store reopen (persisted in segment meta)
    store2 = SegmentStore(spark, str(tmp_path / "st"))
    with pytest.raises(QueryRejected, match="UNIQUE constraint failed: t.b"):
        store2.write("seg", "INSERT INTO t VALUES (3,'x')")
    store2.write("seg", "DROP INDEX iu")
    store2.write("seg", "INSERT INTO t VALUES (3,'x')")  # constraint gone
    rows = sorted(d["a"] for d in store2.read("seg", "SELECT * FROM t"))
    assert rows == [1, 3]


def test_partial_and_expression_unique_indexes_rejected(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "st"))
    store.set_schema("s", "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT);")
    store.provision("seg", "s")
    with pytest.raises(QueryRejected, match="partial UNIQUE INDEX"):
        store.write("seg", "CREATE UNIQUE INDEX px ON t (b) WHERE a > 0")
    with pytest.raises(QueryRejected, match="expression entries"):
        store.write("seg", "CREATE UNIQUE INDEX ex ON t (lower(b))")
    # plain index forms stay no-ops, including expressions
    store.write("seg", "CREATE INDEX ip ON t (lower(b))")
    store.write("seg", "DROP INDEX ip")


def test_update_or_modes_rejected_with_unique(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "st"))
    store.set_schema(
        "s", "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE);"
    )
    store.provision("seg", "s")
    store.write("seg", "INSERT INTO t VALUES (1,'x')")
    with pytest.raises(QueryRejected, match="UNIQUE constraints"):
        store.write("seg", "UPDATE OR IGNORE t SET a = a + 1")


def test_triggers_with_unique_constraints(spark, tmp_path):
    """Triggered INSERTs on UNIQUE-constrained tables (round 10 — was a
    loud reject): plain inserts fire and enforce the UNIQUE at flush;
    UNIQUE-only conflicts resolve per mode with the probed trigger
    interplay (differential parity in test_dialect_fuzz).  Triggered
    UPDATE on such tables and pk-less variants stay loud rejects."""
    store = SegmentStore(spark, str(tmp_path / "st"))
    store.set_schema(
        "s",
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE, v INT);\n"
        "CREATE TABLE log (n INT);\n"
        "CREATE TRIGGER trg AFTER INSERT ON t BEGIN "
        "INSERT INTO log VALUES (NEW.a); END;",
    )
    store.provision("seg", "s")
    store.write("seg", "INSERT INTO t VALUES (1,'x',10)")
    store.write("seg", "INSERT INTO t VALUES (2,'y',20)")
    assert sorted(r["n"] for r in store.read("seg", "SELECT n FROM log")) == [1, 2]
    # plain dup on the UNIQUE raises (script rolls back, no log row)
    with pytest.raises(Exception, match="UNIQUE"):
        store.write("seg", "INSERT INTO t VALUES (9,'x',99)")
    # OR REPLACE on the UNIQUE deletes the conflicting row silently and
    # fires the INSERT triggers for the new row only (probed)
    store.write("seg", "INSERT OR REPLACE INTO t VALUES (9,'x',99)")
    assert {(r["a"], r["b"]) for r in store.read("seg", "SELECT a, b FROM t")} == {
        (2, "y"),
        (9, "x"),
    }
    assert sorted(r["n"] for r in store.read("seg", "SELECT n FROM log")) == [1, 2, 9]
    # OR IGNORE on the UNIQUE fires BEFORE-only semantics (no AFTER log)
    store.write("seg", "INSERT OR IGNORE INTO t VALUES (7,'y',70)")
    assert sorted(r["a"] for r in store.read("seg", "SELECT a FROM t")) == [2, 9]
    # triggered UPDATE on a UNIQUE-constrained table stays a loud reject
    with pytest.raises(QueryRejected, match="triggers and UNIQUE"):
        store.write(
            "seg",
            "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN "
            "INSERT INTO log VALUES (-1); END;\n"
            "UPDATE t SET v = 0 WHERE a = 2",
        )


def test_unique_fast_path_unchanged_for_binary_pk(spark, tmp_path):
    """Tables with ONLY a binary pk keep the batch upsert path (no
    driver-side collect): spot-check OR REPLACE still works and the
    sequential resolver is not invoked (monkeypatch sentinel)."""
    store = SegmentStore(spark, str(tmp_path / "st"))
    store.set_schema("s", "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT);")
    store.provision("seg", "s")
    calls = []
    orig = store._conflict_rows_sequential
    store._conflict_rows_sequential = lambda *a, **k: calls.append(1) or orig(*a, **k)
    store.write("seg", "INSERT INTO t VALUES (1,'x')")
    store.write("seg", "INSERT OR REPLACE INTO t VALUES (1,'y')")
    assert not calls, "binary-pk table took the sequential path"
    assert store.read("seg", "SELECT * FROM t") == [{"a": 1, "b": "y"}]


def test_read_path_column_collations(spark, tmp_path):
    """SQLite uses the COLUMN's collation for bare =, IN, DISTINCT and
    ORDER BY; the registered views carry the matching Spark collation
    (NOCASE -> UTF8_LCASE, RTRIM -> UTF8_BINARY_RTRIM) so Catalyst applies
    it everywhere.  Differential vs live SQLite."""
    ddl = (
        "CREATE TABLE t (name TEXT PRIMARY KEY COLLATE NOCASE, v INT);"
        "CREATE TABLE r (s TEXT COLLATE RTRIM, n INT)"
    )
    seed = [
        "INSERT INTO t VALUES ('Alpha', 3)",
        "INSERT INTO t VALUES ('beta', 1)",
        "INSERT INTO r VALUES ('a  ', 1)",
        "INSERT INTO r VALUES ('b', 2)",
    ]
    con = sqlite3.connect(":memory:")
    for d in ddl.split(";"):
        con.execute(d)
    for s in seed:
        con.execute(s)
    store = SegmentStore(spark, str(tmp_path / "st"))
    store.set_schema("s", ddl + ";")
    store.provision("seg", "s")
    for s in seed:
        store.write("seg", s)
    queries = [
        "SELECT v FROM t WHERE name = 'aLpHa'",
        "SELECT count(*) AS n FROM t WHERE name IN ('ALPHA', 'BETA')",
        "SELECT name FROM t ORDER BY name",
        "SELECT count(DISTINCT name) AS d FROM t",
        "SELECT n FROM r WHERE s = 'a'",
        "SELECT count(*) AS n FROM r WHERE s = 'b   '",
    ]
    for q in queries:
        sq = [tuple(r) for r in con.execute(q).fetchall()]
        en = [tuple(d[k] for k in d) for d in store.read("seg", q)]
        assert sq == en, f"{q}: sqlite={sq} engine={en}"


def test_alter_add_column_constraint_rejects(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "st"))
    store.set_schema("s", "CREATE TABLE t (a INT);")
    store.provision("seg", "s")
    with pytest.raises(QueryRejected, match="Cannot add a UNIQUE column"):
        store.write("seg", "ALTER TABLE t ADD COLUMN u TEXT UNIQUE")
    with pytest.raises(QueryRejected, match="Cannot add a PRIMARY KEY column"):
        store.write("seg", "ALTER TABLE t ADD COLUMN p TEXT PRIMARY KEY")
    # COLLATE on an added column is legal and participates in later
    # unique indexes (SQLite)
    store.write("seg", "ALTER TABLE t ADD COLUMN c TEXT COLLATE NOCASE")
    store.write("seg", "INSERT INTO t VALUES (1, 'Xy')")
    store.write("seg", "CREATE UNIQUE INDEX iu ON t (c)")
    with pytest.raises(QueryRejected, match="UNIQUE constraint failed: t.c"):
        store.write("seg", "INSERT INTO t VALUES (2, 'xY')")


def test_merge_asserts_unique_state(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "st"))
    store.set_schema(
        "s", "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE);"
    )
    store.provision("seg", "s")
    store.write("seg", "INSERT INTO t VALUES (1,'x'), (2,'y')")
    src = spark.createDataFrame([(2, "x")], "a long, b string")
    with pytest.raises(QueryRejected, match="UNIQUE constraint failed: t.b"):
        store.merge("seg", "t", src)
