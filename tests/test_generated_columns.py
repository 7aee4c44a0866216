"""Generated columns (SQLite 3.31, gencol.html) — write-path differential
vs live SQLite.

VIRTUAL and STORED both materialize in this engine's storage (every
base-column change goes through the write paths, which recompute), so
read results are identical to SQLite's compute-on-read VIRTUAL model.
Every rule here was probed live first; the runner re-derives expected
outcomes from stdlib sqlite3 on each run.
"""

from __future__ import annotations

import sqlite3

import pytest

from trough_spark.store import QueryRejected, SegmentStore


def _run_differential(spark, tmp_path, title, ddl, stmts, probe="SELECT * FROM t"):
    con = sqlite3.connect(":memory:")
    con.executescript(ddl if ddl.rstrip().endswith(";") else ddl + ";")
    sq_err = []
    for s in stmts:
        try:
            con.execute(s)
            sq_err.append(None)
        except sqlite3.Error as e:
            sq_err.append(str(e))
    cols = [c[0] for c in con.execute(probe).description]
    sq_rows = sorted(
        (tuple(r[cols.index(k)] for k in sorted(cols))
         for r in con.execute(probe).fetchall()),
        key=repr,
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
        (tuple(d[k] for k in sorted(d)) for d in store.read("seg", probe)),
        key=repr,
    )
    for i, (a, b) in enumerate(zip(sq_err, en_err)):
        assert (a is None) == (b is None), (
            f"{title} stmt {i}: sqlite={a!r} engine={b!r}"
        )
    assert sq_rows == en_rows, f"{title}: rows {sq_rows} vs {en_rows}"


DDL = (
    "CREATE TABLE t (id INTEGER PRIMARY KEY, a INT, b TEXT, "
    "g INT GENERATED ALWAYS AS (a * 2) VIRTUAL, "
    "s TEXT AS (upper(b)) STORED)"
)


def test_generated_insert_update_delete(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "basic", DDL,
        [
            "INSERT INTO t (id, a, b) VALUES (1, 5, 'x'), (2, NULL, NULL)",
            "INSERT INTO t VALUES (3, 8, 'z')",  # arity excludes generated
            "INSERT INTO t (id, a, g) VALUES (9, 6, 99)",  # reject
            "UPDATE t SET g = 5",  # reject
            "UPDATE t SET a = a + 10 WHERE id = 1",  # recompute
            "UPDATE t SET b = 'q' WHERE id = 2",
            "DELETE FROM t WHERE id = 3",
            "INSERT INTO t (id, a, b) VALUES (4, 1, 'w'), (5, 2, 'v')",
        ],
    )


def test_generated_chained_and_conflicts(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "chained",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, a INT, "
        "g1 INT AS (a + 1), g2 INT AS (g1 * 2))",
        [
            "INSERT INTO t (id, a) VALUES (1, 10), (2, 20)",
            "INSERT OR REPLACE INTO t (id, a) VALUES (1, 30)",
            "INSERT OR IGNORE INTO t (id, a) VALUES (2, 99), (3, 40)",
            "INSERT INTO t (id, a) VALUES (3, 50) "
            "ON CONFLICT(id) DO UPDATE SET a = excluded.a + 5",
            "INSERT INTO t (id, a) VALUES (4, 60) ON CONFLICT DO NOTHING",
        ],
    )


def test_generated_check_unique(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "check-unique",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, a INT, "
        "g INT AS (a % 3) UNIQUE, c INT AS (a + 1) CHECK (c < 100))",
        [
            "INSERT INTO t (id, a) VALUES (1, 1)",
            "INSERT INTO t (id, a) VALUES (2, 4)",  # g=1 dup -> raises
            "INSERT INTO t (id, a) VALUES (3, 2)",
            "INSERT INTO t (id, a) VALUES (4, 500)",  # CHECK on c -> raises
            "INSERT OR IGNORE INTO t (id, a) VALUES (5, 7), (6, 3)",  # 7%3=1 skip
            "UPDATE t SET a = 99 WHERE id = 1",  # CHECK c<100: 100 -> raises
        ],
    )


def test_generated_returning_and_triggers(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "returning-triggers",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, a INT, g INT AS (a * 2)); "
        "CREATE TABLE log (v INT)",
        [
            "CREATE TRIGGER bt BEFORE INSERT ON t BEGIN "
            "INSERT INTO log VALUES (NEW.g); END",
            "INSERT INTO t (id, a) VALUES (10, 8)",
            "INSERT INTO t (id, a) VALUES (11, 9)",
        ],
        probe="SELECT * FROM log",
    )
    # RETURNING a generated column yields the computed value (probed)
    store = SegmentStore(spark, str(tmp_path / "ret"))
    store.set_schema(
        "s", "CREATE TABLE t (id INTEGER PRIMARY KEY, a INT, g INT AS (a * 2));"
    )
    store.provision("seg", "s")
    out = store.write("seg", "INSERT INTO t (id, a) VALUES (1, 3) RETURNING g")
    assert out == [{"g": 6}]
    out = store.write("seg", "UPDATE t SET a = 5 WHERE id = 1 RETURNING g, a")
    assert out == [{"g": 10, "a": 5}]


def test_generated_ddl_rejects(spark, tmp_path):
    """DDL-time rules with SQLite's verbatim errors (all probed)."""
    store = SegmentStore(spark, str(tmp_path / "ddl"))
    cases = [
        ("CREATE TABLE p (a INT, g INT AS (a) PRIMARY KEY);",
         "generated columns cannot be part of the PRIMARY KEY"),
        ("CREATE TABLE p (a INT, g INT AS (a), PRIMARY KEY (g));",
         "generated columns cannot be part of the PRIMARY KEY"),
        ("CREATE TABLE sq (a INT, g INT AS ((SELECT 1)));",
         "subqueries prohibited in generated columns"),
        ("CREATE TABLE dg (a INT, g INT AS (a) DEFAULT 5);",
         "cannot use DEFAULT on a generated column"),
        ("CREATE TABLE nd (a INT, g INT AS (random()));",
         "non-deterministic functions prohibited in generated columns"),
        ("CREATE TABLE ct (a INT, g TEXT AS (CURRENT_TIMESTAMP));",
         "non-deterministic functions prohibited in generated columns"),
        ("CREATE TABLE ag (a INT, g INT AS (count(a)));",
         "misuse of aggregate function count()"),
        ("CREATE TABLE am (a INT, g INT AS (min(a)));",
         "misuse of aggregate function min()"),
    ]
    for i, (ddl, msg) in enumerate(cases):
        # sqlite agrees on every reject
        con = sqlite3.connect(":memory:")
        with pytest.raises(sqlite3.Error):
            con.execute(ddl.rstrip(";"))
        with pytest.raises(QueryRejected) as ei:
            store.set_schema(f"bad{i}", ddl)
        assert msg in str(ei.value), f"{ddl}: {ei.value}"
    # cycle raises at first INSERT (SQLite's behavior), loop error text
    store.set_schema("cyc", "CREATE TABLE c1 (a INT, g1 INT AS (g2), g2 INT AS (g1));")
    store.provision("segc", "cyc")
    with pytest.raises(QueryRejected, match="generated column loop"):
        store.write("segc", "INSERT INTO c1 (a) VALUES (1)")
    # datetime('now') is allowed (probed SQLite quirk vs CURRENT_TIMESTAMP)
    store.set_schema(
        "now_ok", "CREATE TABLE dn (a INT, g TEXT AS (datetime('now')));"
    )


def test_generated_alter_add(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "alter",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, a INT)",
        [
            "INSERT INTO t VALUES (1, 10), (2, 20)",
            "ALTER TABLE t ADD COLUMN g INT AS (a * 3)",  # VIRTUAL backfill
            "ALTER TABLE t ADD COLUMN g2 INT AS (a) STORED",  # reject
            "INSERT INTO t (id, a) VALUES (3, 30)",
        ],
    )


def test_generated_table_info_hides(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "ti"))
    store.set_schema("s", DDL + ";")
    store.provision("seg", "s")
    rows = store.read("seg", "PRAGMA table_info(t)")
    con = sqlite3.connect(":memory:")
    con.execute(DDL)
    expected = [
        {"cid": r[0], "name": r[1], "type": r[2], "notnull": r[3],
         "dflt_value": r[4], "pk": r[5]}
        for r in con.execute("PRAGMA table_info(t)").fetchall()
    ]
    assert rows == expected


def test_generated_update_or_modes(spark, tmp_path):
    _run_differential(
        spark, tmp_path, "or-modes",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, a INT, g INT AS (a + id))",
        [
            "INSERT INTO t (id, a) VALUES (1, 10), (2, 20), (3, 30)",
            "UPDATE OR IGNORE t SET id = id + 1 WHERE id < 3",
            "UPDATE OR REPLACE t SET id = 2 WHERE id = 1",
        ],
    )
