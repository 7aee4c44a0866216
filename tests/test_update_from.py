"""UPDATE ... FROM (SQLite 3.33, lang_update.html §2) — differential vs
live SQLite.  Multi-match outcomes are documented by SQLite as
unpredictable, so every differential case here has at most one FROM match
per target row; the engine's deterministic greatest-tuple pick is asserted
separately."""

from __future__ import annotations

import sqlite3

import pytest

from trough_spark.store import QueryRejected, SegmentStore

DDL = (
    "CREATE TABLE t (id INTEGER PRIMARY KEY, a INT, b TEXT); "
    "CREATE TABLE src (id INT, v INT, w TEXT)"
)


def _run(spark, tmp_path, title, stmts, ddl=DDL):
    con = sqlite3.connect(":memory:")
    con.executescript(ddl + ";")
    sq_err = []
    for s in stmts:
        try:
            con.execute(s)
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
    for s in stmts:
        try:
            store.write("seg", s)
            en_err.append(None)
        except QueryRejected as e:
            en_err.append(str(e))
    en_rows = sorted(
        (tuple(d.values()) for d in store.read("seg", "SELECT * FROM t")),
        key=repr,
    )
    for i, (x, y) in enumerate(zip(sq_err, en_err)):
        assert (x is None) == (y is None), f"{title} stmt {i}: {x!r} vs {y!r}"
    assert sq_rows == en_rows, f"{title}: {sq_rows} vs {en_rows}"


def test_update_from_basic(spark, tmp_path):
    _run(
        spark, tmp_path, "basic",
        [
            "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'z')",
            "INSERT INTO src VALUES (1, 100, 'q'), (2, 200, 'r'), (9, 900, 'n')",
            # matched rows update; unmatched (id=3) untouched
            "UPDATE t SET a = src.v FROM src WHERE t.id = src.id",
            # alias form + expression over both sides
            "UPDATE t SET a = s.v + t.a FROM src AS s WHERE t.id = s.id",
            # multiple SET columns from the source
            "UPDATE t SET a = src.v, b = src.w FROM src WHERE t.id = src.id",
        ],
    )


def test_update_from_subquery_and_comma_join(spark, tmp_path):
    _run(
        spark, tmp_path, "subq",
        [
            "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y')",
            "INSERT INTO src VALUES (1, 7, 'a'), (1, 9, 'b'), (2, 5, 'c')",
            # grouped subquery in FROM collapses multi-matches deterministically
            "UPDATE t SET a = m.mx FROM (SELECT id, max(v) AS mx FROM src "
            "GROUP BY id) m WHERE t.id = m.id",
            # comma join of two FROM relations
            "CREATE TABLE w (k INT)",
            "INSERT INTO w VALUES (1)",
            "UPDATE t SET a = m.mx + w.k FROM (SELECT id, max(v) AS mx "
            "FROM src GROUP BY id) m, w WHERE t.id = m.id",
        ],
    )


def test_update_from_where_filter_and_self_join(spark, tmp_path):
    _run(
        spark, tmp_path, "self",
        [
            "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'z')",
            # self-join: each row takes the next row's value (single match)
            "UPDATE t SET a = t2.a FROM t AS t2 WHERE t.id = t2.id - 1",
            # extra WHERE conditions beyond the join key
            "INSERT INTO src VALUES (1, 1000, 'k')",
            "UPDATE t SET b = src.w FROM src WHERE t.id = src.id AND t.a > 15",
        ],
    )


def test_update_from_returning(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "ret"))
    store.set_schema("s", DDL + ";")
    store.provision("seg", "s")
    store.write(
        "seg",
        "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y');"
        "INSERT INTO src VALUES (1, 100, 'q');",
    )
    out = store.write(
        "seg",
        "UPDATE t SET a = src.v FROM src WHERE t.id = src.id "
        "RETURNING t.id, a, b",
    )
    assert out == [{"id": 1, "a": 100, "b": "x"}]
    # sqlite agrees (probed shape)
    con = sqlite3.connect(":memory:")
    con.executescript(DDL + ";")
    con.executescript(
        "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y');"
        "INSERT INTO src VALUES (1, 100, 'q');"
    )
    assert con.execute(
        "UPDATE t SET a = src.v FROM src WHERE t.id = src.id "
        "RETURNING t.id, a, b"
    ).fetchall() == [(1, 100, "x")]


def test_update_from_multimatch_deterministic(spark, tmp_path):
    """SQLite documents multi-match as unpredictable; the engine picks the
    greatest SET-value tuple — pinned here so it can never silently flip."""
    store = SegmentStore(spark, str(tmp_path / "mm"))
    store.set_schema("s", DDL + ";")
    store.provision("seg", "s")
    store.write(
        "seg",
        "INSERT INTO t VALUES (1, 0, 'x');"
        "INSERT INTO src VALUES (1, 7, 'a'), (1, 9, 'b'), (1, 8, 'c');",
    )
    store.write("seg", "UPDATE t SET a = src.v FROM src WHERE t.id = src.id")
    assert store.read("seg", "SELECT a FROM t") == [{"a": 9}]


def test_update_from_rejects_and_triggered_path(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "rej"))
    store.set_schema(
        "s",
        DDL + "; CREATE TABLE nopk (x INT, y INT);"
        "CREATE TRIGGER tr AFTER UPDATE ON t BEGIN "
        "INSERT INTO src VALUES (NEW.id, NEW.a, 'log'); END;",
    )
    store.provision("seg", "s")
    store.write("seg", "INSERT INTO t VALUES (1, 10, 'x')")
    store.write("seg", "INSERT INTO nopk VALUES (1, 2)")
    store.write("seg", "INSERT INTO src VALUES (1, 77, 'v')")
    # UPDATE..FROM on a TRIGGERED table is supported since round 10: the
    # update applies and the trigger fires per matched row (differential
    # parity in test_dialect_fuzz)
    store.write("seg", "UPDATE t SET a = src.v FROM src WHERE t.id = src.id")
    assert store.read("seg", "SELECT a FROM t WHERE id = 1")[0]["a"] == 77
    assert (
        store.read("seg", "SELECT count(*) AS n FROM src WHERE w = 'log'")[0]["n"] == 1
    )
    # pk-less targets and OR-mode interplay stay loud rejects
    with pytest.raises(QueryRejected, match="no PRIMARY KEY"):
        store.write(
            "seg", "UPDATE nopk SET y = src.v FROM src WHERE nopk.x = src.id"
        )
    with pytest.raises(QueryRejected, match="OR IGNORE/REPLACE ... FROM"):
        store.write(
            "seg",
            "UPDATE OR IGNORE nopk SET y = src.v FROM src WHERE nopk.x = src.id",
        )


def test_update_from_string_literal_containing_from(spark, tmp_path):
    """A SET value containing the word FROM in a string literal must not
    trigger the join path (tokenizer-aware split)."""
    _run(
        spark, tmp_path, "literal",
        [
            "INSERT INTO t VALUES (1, 10, 'x')",
            "UPDATE t SET b = 'pick FROM menu' WHERE id = 1",
            # ... and a scalar subquery's FROM stays inside its parens
            "INSERT INTO src VALUES (1, 55, 'q')",
            "UPDATE t SET a = (SELECT max(v) FROM src) WHERE id = 1",
        ],
    )


def test_update_delete_where_subquery(spark, tmp_path):
    """SET/WHERE subqueries that read OTHER tables of the segment route
    through the read path (pre-statement state, like SQLite)."""
    _run(
        spark, tmp_path, "subquery-where",
        [
            "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'z')",
            "INSERT INTO src VALUES (1, 15, 'q'), (2, 99, 'r')",
            # IN-subquery WHERE on UPDATE
            "UPDATE t SET b = 'hit' WHERE id IN (SELECT id FROM src WHERE v > 50)",
            # subquery SET with no WHERE (every row)
            "UPDATE t SET a = a + (SELECT count(*) FROM src)",
            # correlated scalar subquery in SET
            "UPDATE t SET a = coalesce((SELECT v FROM src WHERE src.id = t.id), a)",
            # DELETE with an IN-subquery WHERE
            "DELETE FROM t WHERE id IN (SELECT id FROM src WHERE v < 50)",
            # DELETE with NOT EXISTS
            "DELETE FROM t WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.id = t.id)",
        ],
    )
    # RETURNING through the subquery routes
    store = SegmentStore(spark, str(tmp_path / "sqret"))
    store.set_schema("s", DDL + ";")
    store.provision("seg", "s")
    store.write(
        "seg",
        "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y');"
        "INSERT INTO src VALUES (1, 7, 'q');",
    )
    out = store.write(
        "seg",
        "UPDATE t SET a = (SELECT v FROM src WHERE src.id = t.id) "
        "WHERE id IN (SELECT id FROM src) RETURNING id, a",
    )
    assert out == [{"id": 1, "a": 7}]
    out = store.write(
        "seg",
        "DELETE FROM t WHERE id IN (SELECT id FROM src) RETURNING id, b",
    )
    assert out == [{"id": 1, "b": "x"}]
