"""Grammar-based differential fuzzing of the dialect shim: randomly
generated SELECTs (seeded, reproducible) executed by real SQLite AND the
shimmed engine over identical data, results compared row-for-row.

The grammar is integer/NULL-focused on purpose: it exercises operator
precedence, CASE/iif nesting, three-valued logic, and NULL propagation —
the places hand-written differential cases have gaps.  Floating division
is excluded: SQLite's `/` is integer division when both operands carry
INTEGER affinity, which is dynamically typed information a static
translator cannot see (documented in SURVEY.md as the known divergence).
"""

from __future__ import annotations

import os
import random
import re
import sqlite3

import pytest

from trough_spark.store import SegmentStore

ROWS = [
    (1, 10, 3, "apple"),
    (2, None, -4, "Banana split"),
    (3, 7, 0, None),
    (4, None, 25, ""),
    (5, 2, 7, "date"),
]
DDL = "CREATE TABLE nums (id INTEGER PRIMARY KEY, a INTEGER, b INTEGER, s TEXT)"

# CI-sized vs wide-sweep split (round 11, VERDICT item 7): the write-
# script fuzz families cost 20-90 s PER CASE (each runs a multi-statement
# trigger/constraint script through the store on Spark), which grew the
# default suite past the driver's verify budget (cut off at ~31% in
# VERIFY_r10).  Defaults below are the CI-sized prefixes of the SAME
# seeded case streams; TROUGH_SUITE_WIDE=1 restores the historical wide
# sweeps, and each family's explicit TROUGH_FUZZ_* env always wins.
_WIDE = os.environ.get("TROUGH_SUITE_WIDE") == "1"


def _n(env: str, wide: int, ci: int) -> int:
    v = os.environ.get(env)
    if v is not None:
        return int(v)
    return wide if _WIDE else ci


N_QUERIES = _n("TROUGH_FUZZ_N", 60, 24)
SEED = int(os.environ.get("TROUGH_FUZZ_SEED", "20260814"))


def _expr(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(["a", "b", "id", str(rng.randint(-9, 9))])
    kind = rng.randrange(9)
    e1, e2 = _expr(rng, depth - 1), _expr(rng, depth - 1)
    if kind == 0:
        return f"({e1} + {e2})"
    if kind == 1:
        return f"({e1} - {e2})"
    if kind == 2:
        return f"({e1} * {e2})"
    if kind == 3:
        return f"abs({e1})"
    if kind == 4:
        return f"coalesce({e1}, {e2})"
    if kind == 5:
        return f"{rng.choice(['min', 'max'])}({e1}, {e2})"
    if kind == 6:
        if rng.random() < 0.25:  # ELSE-less CASE yields NULL on no-match
            return f"(CASE WHEN {_pred(rng, depth - 1)} THEN {e1} END)"
        return f"(CASE WHEN {_pred(rng, depth - 1)} THEN {e1} ELSE {e2} END)"
    if kind == 7:
        return f"iif({_pred(rng, depth - 1)}, {e1}, {e2})"
    extra = rng.randrange(5)
    if extra == 0:
        return f"(- {e1})"  # space: bare -- starts a comment in BOTH engines
    if extra == 1:
        return f"nullif({e1}, {e2})"
    if extra == 2:
        return f"length({_sexpr(rng, depth - 1)})"
    if extra == 3:
        return f"CAST({_sexpr(rng, depth - 1)} AS INTEGER)"
    return f"({e1} % {rng.randint(1, 5)})"


def _sexpr(rng: random.Random, depth: int) -> str:
    """String-valued expression.  Int and string worlds never mix: SQLite
    compares across types by type ordering (INTEGER < TEXT always), which is
    dynamic-typing semantics a static translator cannot reproduce."""
    if depth <= 0:
        return rng.choice(["s", "'ap'", "'zz'", "''", "'Ban'"])
    kind = rng.randrange(6)
    e1, e2 = _sexpr(rng, depth - 1), _sexpr(rng, depth - 1)
    if kind == 0:
        return f"upper({e1})"
    if kind == 1:
        return f"lower({e1})"
    if kind == 2:
        return f"substr({e1}, {rng.randint(0, 3)}, {rng.randint(1, 4)})"
    if kind == 3:
        return f"replace({e1}, 'a', 'z')"
    if kind == 4:
        return f"({e1} || {e2})"
    if kind == 5 and rng.random() < 0.4:
        return f"CAST({_expr(rng, depth - 1)} AS TEXT)"
    return f"coalesce({e1}, {e2})"


def _pred(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        op = rng.choice(["=", "<", ">", "<=", ">=", "!=", "<>"])
        return f"{_expr(rng, 0)} {op} {_expr(rng, 0)}"
    kind = rng.randrange(5)
    if kind == 0:
        return f"({_pred(rng, depth - 1)} AND {_pred(rng, depth - 1)})"
    if kind == 1:
        return f"({_pred(rng, depth - 1)} OR {_pred(rng, depth - 1)})"
    if kind == 2:
        return f"(NOT {_pred(rng, depth - 1)})"
    if kind == 3:
        return f"{rng.choice([_expr, _sexpr])(rng, depth - 1)} IS NULL"
    if kind == 4 and rng.random() < 0.5:
        r = rng.random()
        if r < 0.3:
            pat = rng.choice(["'a%'", "'%an%'", "'%e'", "'_pp%'"])
            return f"{_sexpr(rng, depth - 1)} LIKE {pat}"
        op = rng.choice(["=", "<", ">", "!="])
        return f"{_sexpr(rng, depth - 1)} {op} {_sexpr(rng, depth - 1)}"
    r = rng.random()
    if r < 0.15:
        lo, hi = sorted((rng.randint(-9, 9), rng.randint(-9, 9)))
        return f"{_expr(rng, depth - 1)} BETWEEN {lo} AND {hi}"
    if r < 0.3:
        vals = ", ".join(str(rng.randint(-9, 9)) for _ in range(rng.randint(1, 4)))
        return f"{_expr(rng, depth - 1)} {rng.choice(['IN', 'NOT IN'])} ({vals})"
    op = rng.choice(["=", "<", ">", "<=", ">=", "!="])
    return f"{_expr(rng, depth - 1)} {op} {_expr(rng, depth - 1)}"


def _filter_grid() -> list[str]:
    """Deterministic aggregate-FILTER grid: every fn x frame-start class x
    a predicate, so the probed min/max sliding-start filter-ignore and the
    CASE rewrite are exercised on EVERY campaign run (the random draws hit
    them too rarely to rely on)."""
    out = []
    preds = ["b > 0", "a IS NULL", "id % 2 = 0"]
    starts = ["UNBOUNDED PRECEDING", "2 PRECEDING"]
    for i, fn in enumerate(["sum", "min", "max", "count", "avg", "total"]):
        for j, start in enumerate(starts):
            p = preds[(i + j) % len(preds)]
            out.append(
                f"SELECT id, {fn}(a) FILTER (WHERE {p}) "
                f"OVER (ORDER BY id ROWS BETWEEN {start} AND CURRENT ROW) AS c0 "
                f"FROM nums ORDER BY id"
            )
    out.append(
        "SELECT id, count(*) FILTER (WHERE b > 0) OVER "
        "(PARTITION BY (a IS NULL) ORDER BY id) AS c0 FROM nums ORDER BY id"
    )
    out.append(
        "SELECT sum(a) FILTER (WHERE b > 0) AS c0, "
        "count(*) FILTER (WHERE a IS NULL) AS c1 FROM nums"
    )
    return out


def _queries() -> list[str]:
    rng = random.Random(SEED)
    out = _filter_grid()
    for _ in range(N_QUERIES):
        shape = rng.random()
        if shape < 0.15:
            # whole-table aggregate
            inner = _expr(rng, rng.randint(0, 2))
            aggs = ", ".join(
                f"{rng.choice(['sum', 'count', 'min', 'max', 'avg', 'total'])}({inner}) AS c{i}"
                for i in range(rng.randint(1, 2))
            )
            where = f" WHERE {_pred(rng, 1)}" if rng.random() < 0.5 else ""
            out.append(f"SELECT 0 AS id, {aggs} FROM nums{where}")
            continue
        if shape < 0.3:
            # grouped aggregate (b is never NULL; a exercises the NULL group)
            g = rng.choice(["a", "b"])
            out.append(
                f"SELECT {g} AS id, count(*) AS c0, "
                f"{rng.choice(['sum', 'min', 'max'])}({_expr(rng, 1)}) AS c1 "
                f"FROM nums GROUP BY {g} ORDER BY {g}"
            )
            continue
        if shape < 0.42:
            # structural shapes: subqueries, self-joins, set ops
            r = rng.random()
            if r < 0.25:
                # correlated scalar subquery (equality correlation — the
                # form every engine supports)
                agg = rng.choice(["max", "min", "sum", "count"])
                out.append(
                    f"SELECT id, (SELECT {agg}(n2.a) FROM nums n2 WHERE n2.b = nums.b) AS c0 "
                    f"FROM nums ORDER BY id"
                )
            elif r < 0.5:
                out.append(
                    f"SELECT id, {_expr(rng, 1)} AS c0 FROM nums "
                    f"WHERE id {rng.choice(['IN', 'NOT IN'])} "
                    f"(SELECT id FROM nums WHERE {_pred(rng, 1)}) ORDER BY id"
                )
            elif r < 0.7:
                k = rng.randint(1, 3)
                # qualify every column ref: unqualified names are ambiguous
                # in a self-join (SQLite errors on them too)
                e = re.sub(r"\b(a|b|s|id)\b", r"x.\1", _expr(rng, 1))
                out.append(
                    f"SELECT x.id, y.id AS c0, {e} AS c1 "
                    f"FROM nums x JOIN nums y ON y.id = x.id + {k} ORDER BY x.id"
                )
            else:
                op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
                out.append(
                    f"SELECT id FROM nums WHERE {_pred(rng, 1)} "
                    f"{op} SELECT id FROM nums WHERE {_pred(rng, 1)} ORDER BY id"
                )
            continue
        if shape < 0.55:
            # window functions: frames over the deterministic id order
            inner = _expr(rng, rng.randint(0, 1))
            w = rng.random()
            if w < 0.3:
                fn = rng.choice(["row_number()", "rank()", "dense_rank()"])
                over = f"ORDER BY b, id"
            elif w < 0.6:
                fn = f"{rng.choice(['lag', 'lead'])}({inner}, {rng.randint(1, 2)}, {rng.randint(-9, 9)})"
                over = "ORDER BY id"
            else:
                fn = f"{rng.choice(['sum', 'min', 'max', 'count'])}({inner})"
                start = rng.choice(["UNBOUNDED PRECEDING", f"{rng.randint(1, 3)} PRECEDING"])
                over = f"ORDER BY id ROWS BETWEEN {start} AND CURRENT ROW"
                if rng.random() < 0.5:
                    # aggregate FILTER clause: exercises the CASE rewrite
                    # (unbounded starts) AND the probed min/max
                    # sliding-start filter-ignore bug-compat drop — the
                    # differential against live SQLite decides both
                    fn += f" FILTER (WHERE {_pred(rng, 1)})"
            part = "PARTITION BY (b > 0) " if rng.random() < 0.3 else ""
            out.append(f"SELECT id, {fn} OVER ({part}{over}) AS c0 FROM nums ORDER BY id")
            continue
        if shape < 0.62:
            # expression ORDER BY: NULL placement (NULLs are smallest in
            # both engines), DESC, ties broken by id for determinism
            e = _expr(rng, rng.randint(1, 2))
            d = rng.choice(["ASC", "DESC"])
            out.append(f"SELECT id, {e} AS c0 FROM nums ORDER BY {e} {d}, id")
            continue
        n_cols = rng.randint(1, 3)
        cols = ", ".join(
            f"{rng.choice([_expr, _expr, _sexpr])(rng, rng.randint(1, 3))} AS c{i}"
            for i in range(n_cols)
        )
        where = f" WHERE {_pred(rng, rng.randint(1, 2))}" if rng.random() < 0.6 else ""
        out.append(f"SELECT id, {cols} FROM nums{where} ORDER BY id")
    return out


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fuzz")
    conn = sqlite3.connect(":memory:")
    conn.execute(DDL)
    conn.executemany("INSERT INTO nums VALUES (?, ?, ?, ?)", ROWS)
    store = SegmentStore(spark, str(tmp / "store"))
    store.set_schema("nums_schema", DDL + ";")
    store.provision("fuzzseg", "nums_schema")
    inserts = ";\n".join(
        "INSERT INTO nums (id, a, b, s) VALUES (%s)"
        % ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r
        )
        for r in ROWS
    )
    store.write("fuzzseg", inserts)
    yield conn, store
    conn.close()


@pytest.mark.parametrize("sql", _queries())
def test_fuzzed_select_matches_sqlite(engines, sql):
    conn, store = engines
    expected = [tuple(row) for row in conn.execute(sql).fetchall()]
    got = store.read("fuzzseg", sql)
    got_rows = [tuple(r[k] for k in sorted(r, key=lambda c: int(c[1:]) if c != "id" else -1)) for r in got]
    # store.read returns list[dict]; order columns as id, c0, c1, ...
    assert got_rows == expected, f"\nsql: {sql}\nsqlite: {expected}\nengine: {got_rows}"


# ---------------------------------------------------------------------------
# datetime-modifier fuzzing: random base timestamps (month ends, leap days)
# through random modifier chains, against real SQLite
# ---------------------------------------------------------------------------
_BASES = [
    "2024-01-31 10:30:00",
    "2024-02-29 23:59:59",
    "2023-12-31 00:00:00",
    "2024-03-15 12:00:00",
    "2023-01-30 06:45:13",
    "2024-06-01 18:20:07",
]
_MODS = (
    [f"'{s}{n} {u}'" for s in ("+", "-") for n in (1, 2, 7, 13, 25) for u in ("days", "months", "years", "hours", "minutes")]
    + ["'start of day'", "'start of month'", "'start of year'"]
)


def _dt_queries() -> list[str]:
    rng = random.Random(SEED + 1)
    out = []
    for _ in range(N_QUERIES):
        base = rng.choice(_BASES)
        # chains up to 6 deep: month/year steps bind the base via a lambda
        # (round 6), so long chains stay linear and must stay SQLite-exact
        mods = ", ".join(rng.choice(_MODS) for _ in range(rng.randint(1, 6)))
        fn = rng.choice(["datetime", "date"])
        out.append(f"SELECT {fn}('{base}', {mods}) AS v")
    return out


@pytest.mark.parametrize("sql", _dt_queries())
def test_fuzzed_datetime_matches_sqlite(engines, sql):
    conn, store = engines
    expected = [tuple(row) for row in conn.execute(sql).fetchall()]
    got = store.read("fuzzseg", sql)
    # datetime()/date() return TEXT in SQLite; the engine returns native
    # timestamp/date values whose str() is the identical rendering
    got_rows = [tuple(str(r[k]) for k in ["v"]) for r in got]
    assert got_rows == expected, f"\nsql: {sql}\nsqlite: {expected}\nengine: {got_rows}"


# strftime format fuzzing: random directive/literal mixes vs real SQLite
_DIRECTIVES = ["%Y", "%m", "%d", "%H", "%M", "%S", "%j", "%w", "%s", "%%"]
_LITERALS = ["day ", " of ", "T", "x-", ":", " ", "@", "w"]


def _strftime_queries() -> list[str]:
    rng = random.Random(SEED + 2)
    out = []
    for _ in range(N_QUERIES):
        n = rng.randint(1, 5)
        fmt = "".join(
            rng.choice(_DIRECTIVES if rng.random() < 0.6 else _LITERALS)
            for _ in range(n)
        )
        base = rng.choice(_BASES)
        out.append(f"SELECT strftime('{fmt}', '{base}') AS v")
    return out


# ---------------------------------------------------------------------------
# backslash-literal + LIKE/ESCAPE fuzzing (round 9): SQLite string literals
# have NO escape character and its LIKE ESCAPE char may precede ANY
# character; the shim respells literals for Spark's parser and re-encodes
# literal ESCAPE patterns — every generated case runs against live SQLite
# ---------------------------------------------------------------------------
_LIT_ALPHA = list("ab\\%_Xq'")


def _rand_lit(rng: random.Random, lo: int = 0, hi: int = 6) -> str:
    return "".join(rng.choice(_LIT_ALPHA) for _ in range(rng.randint(lo, hi)))


def _enc_lit(s: str) -> str:
    """SQLite spelling: quotes doubled, backslashes raw."""
    return "'" + s.replace("'", "''") + "'"


def _dangling_escape(pat: str, esc: str) -> bool:
    i = 0
    while i < len(pat):
        if pat[i] == esc:
            if i + 1 >= len(pat):
                return True
            i += 2
        else:
            i += 1
    return False


def _literal_queries() -> list[str]:
    rng = random.Random(SEED + 3)
    out = []
    for _ in range(N_QUERIES):
        kind = rng.randrange(7)
        if kind == 5:  # function form, reversed operands
            s, p = _enc_lit(_rand_lit(rng)), _enc_lit(_rand_lit(rng))
            out.append(f"SELECT like({p}, {s}) AS v")
            continue
        if kind == 6:  # function form with ESCAPE
            esc = rng.choice(["\\", "X"])
            while True:
                pat = _rand_lit(rng)
                if not _dangling_escape(pat, esc):
                    break
            s = _enc_lit(_rand_lit(rng))
            out.append(
                f"SELECT like({_enc_lit(pat)}, {s}, {_enc_lit(esc)}) AS v"
            )
            continue
        if kind == 0:
            s = _enc_lit(_rand_lit(rng))
            out.append(f"SELECT {s} AS v, length({s}) AS n")
        elif kind == 1:
            s, p = _enc_lit(_rand_lit(rng)), _enc_lit(_rand_lit(rng))
            out.append(f"SELECT CASE WHEN {s} LIKE {p} THEN 1 ELSE 0 END AS v")
        elif kind == 2:
            esc = rng.choice(["\\", "X"])
            while True:
                pat = _rand_lit(rng)
                if not _dangling_escape(pat, esc):
                    break
            s = _enc_lit(_rand_lit(rng))
            out.append(
                f"SELECT CASE WHEN {s} LIKE {_enc_lit(pat)} "
                f"ESCAPE {_enc_lit(esc)} THEN 1 ELSE 0 END AS v"
            )
        elif kind == 3:
            a = _enc_lit(_rand_lit(rng))
            b = _enc_lit(_rand_lit(rng, 1, 3))
            c = _enc_lit(_rand_lit(rng))
            out.append(f"SELECT replace({a}, {b}, {c}) AS v")
        else:
            gl = "".join(
                rng.choice(list("ab\\*?q")) for _ in range(rng.randint(0, 6))
            )
            s = _enc_lit(_rand_lit(rng))
            out.append(
                f"SELECT CASE WHEN {s} GLOB {_enc_lit(gl)} THEN 1 ELSE 0 END AS v"
            )
    return out


@pytest.mark.parametrize("sql", _literal_queries())
def test_fuzzed_backslash_literals_match_sqlite(engines, sql):
    conn, store = engines
    expected = [tuple(row) for row in conn.execute(sql).fetchall()]
    got = store.read("fuzzseg", sql)
    keys = ["v"] if len(expected[0]) == 1 else ["v", "n"]
    got_rows = [tuple(r[k] for k in keys) for r in got]
    assert got_rows == expected, f"\nsql: {sql!r}\nsqlite: {expected}\nengine: {got_rows}"


@pytest.mark.parametrize("sql", _strftime_queries())
def test_fuzzed_strftime_matches_sqlite(engines, sql):
    conn, store = engines
    expected = [tuple(row) for row in conn.execute(sql).fetchall()]
    got_rows = [(str(r["v"]),) for r in store.read("fuzzseg", sql)]
    assert got_rows == expected, f"\nsql: {sql}\nsqlite: {expected}\nengine: {got_rows}"


# ---------------------------------------------------------------------------
# write-path fuzzing: random INSERT/UPDATE/DELETE scripts executed by real
# SQLite and by store.write, final table states compared
# ---------------------------------------------------------------------------
N_WRITE_CASES = _n("TROUGH_FUZZ_WRITES", 6, 2)


def _write_script(rng: random.Random) -> list[str]:
    stmts = []
    next_id = 100
    for _ in range(rng.randint(3, 7)):
        kind = rng.randrange(8)
        if kind == 7:
            # round-7: UPDATE OR IGNORE/REPLACE reassigning the pk —
            # exercises the position-visit conflict model (incl. the
            # dense-id REPLACE chase) against live SQLite
            verb = rng.choice(["OR IGNORE", "OR REPLACE"])
            delta = rng.choice(["id + 1", "id - 1", f"{rng.randint(1, 6)}"])
            where = f" WHERE {_pred(rng, 1)}" if rng.random() < 0.6 else ""
            stmts.append(f"UPDATE {verb} nums SET id = {delta}{where}")
            continue
        if kind == 6:
            # PLAIN insert on a possibly-existing pk: a legitimate
            # 'UNIQUE constraint failed' outcome — both engines must agree
            # on raise/no-raise AND post-rollback state
            rid = rng.choice([1, 3, 5, next_id])
            stmts.append(
                f"INSERT INTO nums (id, a, b, s) VALUES ({rid}, 1, 2, 'dup')"
            )
            next_id += 1
            continue
        if kind == 4:
            # conflict on an existing or fresh id: REPLACE swaps the row,
            # IGNORE keeps the original; sometimes a DO UPDATE upsert with
            # possibly-duplicated keys (sequential accumulation, round 7)
            if rng.random() < 0.4:
                nrows = rng.randint(2, 3)
                ids = [rng.choice([1, 3, 5, next_id]) for _ in range(nrows)]
                vals = ", ".join(
                    f"({i}, {rng.randint(-9, 9)}, {rng.randint(-9, 9)}, 'up')"
                    for i in ids
                )
                stmts.append(
                    f"INSERT INTO nums (id, a, b, s) VALUES {vals} "
                    "ON CONFLICT (id) DO UPDATE SET "
                    "a = coalesce(a, 0) + coalesce(excluded.a, 0), "
                    "s = excluded.s"
                )
                next_id += 1
                continue
            verb = rng.choice(["OR REPLACE", "OR IGNORE"])
            rid = rng.choice([1, 3, 5, next_id])
            stmts.append(
                f"INSERT {verb} INTO nums (id, a, b, s) VALUES "
                f"({rid}, {rng.randint(-9, 9)}, {rng.randint(-9, 9)}, 'swap')"
            )
            next_id += 1
            continue
        if kind == 5:
            where = f" WHERE {_pred(rng, 1)}" if rng.random() < 0.8 else ""
            stmts.append(
                f"UPDATE nums SET a = {_expr(rng, 1)}, b = {_expr(rng, 1)}, "
                f"s = {_sexpr(rng, 1)}{where}"
            )
            continue
        if kind == 0:
            a = rng.choice(["NULL", str(rng.randint(-9, 9))])
            s = rng.choice(["NULL", "'new'", "''", "'Zz'"])
            stmts.append(
                f"INSERT INTO nums (id, a, b, s) VALUES ({next_id}, {a}, {rng.randint(-9, 9)}, {s})"
            )
            next_id += 1
        elif kind == 1:
            where = f" WHERE {_pred(rng, 1)}" if rng.random() < 0.8 else ""
            stmts.append(f"UPDATE nums SET a = {_expr(rng, 1)}{where}")
        elif kind == 2:
            stmts.append(f"UPDATE nums SET s = {_sexpr(rng, 1)} WHERE {_pred(rng, 1)}")
        else:
            stmts.append(f"DELETE FROM nums WHERE {_pred(rng, 1)}")
    return stmts


def _run_script_both(conn, store, seg, stmts) -> tuple[bool, bool]:
    """Execute one script through both engines the way the reference does
    (ONE manual transaction, trough/write.py:38-40): on error both roll the
    whole script back.  Returns (sqlite_raised, engine_raised) so fuzzed
    scripts may legitimately ERROR (e.g. duplicate pk) as long as both
    engines agree on raise/no-raise AND on the resulting state."""
    script = ";\n".join(stmts).rstrip().rstrip(";") + ";"
    sq_raised = False
    try:
        conn.executescript("BEGIN TRANSACTION;\n" + script + "\nCOMMIT;\n")
        conn.commit()
    except sqlite3.Error:
        sq_raised = True
        try:
            conn.execute("ROLLBACK")
        except sqlite3.Error:
            pass
    en_raised = False
    try:
        store.write(seg, script)
    except Exception:
        en_raised = True
    return sq_raised, en_raised


@pytest.mark.parametrize("case", range(N_WRITE_CASES))
def test_fuzzed_write_script_matches_sqlite(spark, tmp_path, case):
    rng = random.Random(SEED + 100 + case)
    ddl = DDL
    if rng.random() < 0.5:
        # random CHECK constraint: scripts then legitimately violate it and
        # both engines must agree on raise/no-raise + rolled-back state
        check = rng.choice(
            [
                "CHECK (a IS NULL OR a > -30)",
                "CHECK (b < 60)",
                "CONSTRAINT s_len CHECK (s IS NULL OR length(s) < 20)",
            ]
        )
        ddl = DDL[:-1] + f", {check})"
    stmts = _write_script(rng)

    conn = sqlite3.connect(":memory:")
    conn.isolation_level = None
    conn.execute(ddl)
    conn.executemany("INSERT INTO nums VALUES (?, ?, ?, ?)", ROWS)
    conn.commit()

    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("nums_schema", ddl + ";")
    store.provision(f"wseg{case}", "nums_schema")
    seed = ";\n".join(
        "INSERT INTO nums (id, a, b, s) VALUES (%s)"
        % ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r
        )
        for r in ROWS
    )
    store.write(f"wseg{case}", seed)
    sq_raised, en_raised = _run_script_both(conn, store, f"wseg{case}", stmts)

    q = "SELECT id, a, b, s FROM nums ORDER BY id"
    expected = [tuple(row) for row in conn.execute(q).fetchall()]
    got = [
        (r["id"], r["a"], r["b"], r["s"]) for r in store.read(f"wseg{case}", q)
    ]
    assert sq_raised == en_raised, (
        f"\nscript: {stmts}\nsqlite raised: {sq_raised}, engine raised: {en_raised}"
    )
    assert got == expected, f"\nscript: {stmts}\nsqlite: {expected}\nengine: {got}"


# ---------------------------------------------------------------------------
# trigger fuzzing: random row triggers installed, then a random DML script —
# SQLite fires them natively, the store fires them via _fire_triggers; final
# states of BOTH tables compared (the audit table exists only via triggers)
# ---------------------------------------------------------------------------
N_TRIGGER_CASES = _n("TROUGH_FUZZ_TRIGGERS", 6, 2)

TRIG_DDL = (
    DDL
    + ";\nCREATE TABLE audit (rid INTEGER, tag TEXT, x INTEGER)"
    + ";\nCREATE TABLE audit2 (rid INTEGER, x INTEGER)"
)


def _cascade_ddl(rng: random.Random) -> list[str]:
    """Second-level triggers ON audit whose bodies write audit2 — fuzzes the
    round-6 cascading path (a body INSERT into audit must fire these under
    live-SQLite recursive_triggers=OFF semantics)."""
    trigs = []
    for i in range(rng.randint(1, 2)):
        timing = rng.choice(["BEFORE", "AFTER"])
        event = rng.choice(["INSERT", "UPDATE", "DELETE"])
        row = {"INSERT": "NEW", "UPDATE": rng.choice(["NEW", "OLD"]), "DELETE": "OLD"}[event]
        when = ""
        if rng.random() < 0.4:
            when = f"WHEN coalesce({row}.x, 0) >= {rng.randint(-20, 20)} "
        body = rng.choice(
            [
                f"INSERT INTO audit2 VALUES ({row}.rid, coalesce({row}.x, -1));",
                f"INSERT INTO audit2 VALUES ({row}.rid, {rng.randint(0, 9)});",
            ]
        )
        trigs.append(
            f"CREATE TRIGGER casc{i} {timing} {event} ON audit "
            f"FOR EACH ROW {when}BEGIN {body} END"
        )
    return trigs


def _trigger_ddl(rng: random.Random, n: int) -> list[str]:
    trigs = []
    for i in range(n):
        timing = rng.choice(["BEFORE", "AFTER"])
        event = rng.choice(["INSERT", "UPDATE", "DELETE"])
        row = {"INSERT": "NEW", "UPDATE": rng.choice(["NEW", "OLD"]), "DELETE": "OLD"}[event]
        of = ""
        if event == "UPDATE" and rng.random() < 0.4:
            of = f" OF {rng.choice(['a', 'b', 's'])}"
        when = ""
        if rng.random() < 0.5:
            when = rng.choice(
                [
                    f"WHEN {row}.id > {rng.randint(0, 5)} ",
                    f"WHEN {row}.a IS NOT NULL ",
                    f"WHEN coalesce({row}.b, 0) >= {rng.randint(-5, 5)} ",
                    # round-10: subquery WHENs read LIVE state per row
                    f"WHEN (SELECT COUNT(*) FROM audit) < {rng.randint(1, 6)} ",
                    f"WHEN (SELECT coalesce(MAX(x), 0) FROM audit) <= "
                    f"{rng.randint(0, 40)} ",
                ]
            )
        body = rng.choice(
            [
                f"INSERT INTO audit VALUES ({row}.id, 't{i}:' || coalesce({row}.s, '?'), "
                f"coalesce({row}.a, 0) + {rng.randint(-3, 3)});",
                f"INSERT INTO audit VALUES ({row}.id, 't{i}', {row}.id * 10);",
                f"UPDATE audit SET x = x + 1 WHERE rid = {row}.id;",
                f"DELETE FROM audit WHERE rid = {row}.id;",
            ]
        )
        trigs.append(
            f"CREATE TRIGGER trg{i} {timing} {event}{of} ON nums "
            f"FOR EACH ROW {when}BEGIN {body} END"
        )
    return trigs


VIEW_DDL = "CREATE VIEW vnums AS SELECT id, a, b, s, a + coalesce(b, 0) AS ab FROM nums"


def _instead_of_ddl(rng: random.Random) -> list[str]:
    """INSTEAD OF triggers on vnums redirecting writes to nums/audit —
    fuzzes the round-6 view-write path (probed SQLite semantics: row set
    materialized up front, bodies fire per row, reverse creation order)."""
    trigs = [VIEW_DDL]
    shapes = [
        (
            "INSERT",
            "NEW",
            [
                "INSERT INTO nums (id, a, b, s) VALUES (NEW.id, NEW.a, NEW.b, NEW.s);",
                "INSERT INTO audit VALUES (NEW.id, 'vi', coalesce(NEW.ab, -1));",
            ],
        ),
        (
            "UPDATE",
            rng.choice(["NEW", "OLD"]),
            [
                "UPDATE nums SET a = NEW.a WHERE id = OLD.id;",
                "INSERT INTO audit VALUES (OLD.id, 'vu', coalesce(OLD.ab, -1));",
            ],
        ),
        (
            "DELETE",
            "OLD",
            [
                "DELETE FROM nums WHERE id = OLD.id;",
                "INSERT INTO audit VALUES (OLD.id, 'vd', coalesce(OLD.ab, -1));",
            ],
        ),
    ]
    for i, (event, row, bodies) in enumerate(shapes):
        if event != "INSERT" and rng.random() < 0.3:
            continue  # sometimes leave UPDATE/DELETE uncovered ("cannot modify")
        when = ""
        if rng.random() < 0.4:
            when = f"WHEN coalesce({row}.ab, 0) >= {rng.randint(-10, 10)} "
        trigs.append(
            f"CREATE TRIGGER vio{i} INSTEAD OF {event} ON vnums "
            f"FOR EACH ROW {when}BEGIN {rng.choice([bodies[0], ' '.join(bodies)])} END"
        )
    return trigs


def _view_script(rng: random.Random) -> list[str]:
    stmts = []
    next_id = 200
    for _ in range(rng.randint(2, 4)):
        kind = rng.randrange(4)
        if kind == 0:
            a = rng.choice(["NULL", str(rng.randint(-9, 9))])
            stmts.append(
                f"INSERT INTO vnums (id, a, b, s, ab) "
                f"VALUES ({next_id}, {a}, {rng.randint(-9, 9)}, 'v', NULL)"
            )
            next_id += 1
        elif kind == 1:
            stmts.append(
                f"UPDATE vnums SET a = coalesce(a, 0) + {rng.randint(-3, 3)} "
                f"WHERE id % {rng.randint(2, 4)} = 0"
            )
        elif kind == 2:
            stmts.append(f"DELETE FROM vnums WHERE id = {rng.randint(0, 8)}")
        else:
            stmts.append(
                f"INSERT INTO nums (id, a, b, s) VALUES ({next_id}, 1, 1, 'n')"
            )
            next_id += 1
    return stmts


def _trigger_script(rng: random.Random) -> list[str]:
    """Random DML confined to the supported triggered-table shapes:
    plain INSERT VALUES / INSERT..SELECT / UPDATE / DELETE (conflict-mode
    inserts on a triggered table are rejected by design)."""
    stmts = []
    next_id = 100
    for _ in range(rng.randint(3, 6)):
        kind = rng.randrange(5)
        if kind == 4:
            # INSERT..SELECT on the triggered table: source rows are
            # materialized and replayed, firing per produced row
            off = rng.randint(50, 80)
            stmts.append(
                f"INSERT INTO nums (id, a, b, s) "
                f"SELECT id + {off}, b, a, s || '+' FROM nums "
                f"WHERE id < {rng.randint(3, 6)}"
            )
            continue
        if kind == 0:
            a = rng.choice(["NULL", str(rng.randint(-9, 9))])
            s = rng.choice(["NULL", "'new'", "''", "'Zz'"])
            stmts.append(
                f"INSERT INTO nums (id, a, b, s) VALUES ({next_id}, {a}, {rng.randint(-9, 9)}, {s})"
            )
            next_id += 1
        elif kind == 1:
            where = f" WHERE {_pred(rng, 1)}" if rng.random() < 0.8 else ""
            stmts.append(f"UPDATE nums SET a = {_expr(rng, 1)}{where}")
        elif kind == 2:
            stmts.append(f"UPDATE nums SET s = {_sexpr(rng, 1)} WHERE {_pred(rng, 1)}")
        else:
            stmts.append(f"DELETE FROM nums WHERE {_pred(rng, 1)}")
    return stmts


@pytest.mark.parametrize("case", range(N_TRIGGER_CASES))
def test_fuzzed_triggers_match_sqlite(spark, tmp_path, case):
    rng = random.Random(SEED + 500 + case)
    trig_ddl = TRIG_DDL
    if rng.random() < 0.4:
        # triggers x CHECK constraints: body INSERTs and the outer script
        # may both violate; engines must agree on raise + rollback state
        trig_ddl = trig_ddl.replace(
            "s TEXT)", "s TEXT, CHECK (coalesce(b, 0) > -50))"
        )
    trigs = _trigger_ddl(rng, rng.randint(1, 3))
    if rng.random() < 0.6:
        trigs += _cascade_ddl(rng)
    stmts = _trigger_script(rng)
    if rng.random() < 0.5:
        # INSTEAD OF leg: a view over nums with redirecting triggers, plus
        # view-DML statements (base-table triggers fire on the redirected
        # writes too — the full cascade)
        trigs += _instead_of_ddl(rng)
        stmts += _view_script(rng)

    conn = sqlite3.connect(":memory:")
    conn.isolation_level = None
    conn.executescript(trig_ddl)
    conn.executemany("INSERT INTO nums VALUES (?, ?, ?, ?)", ROWS)
    conn.commit()
    for t in trigs:
        conn.execute(t)
    conn.commit()

    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("trig_schema", trig_ddl + ";")
    store.provision(f"tseg{case}", "trig_schema")
    seed = ";\n".join(
        "INSERT INTO nums (id, a, b, s) VALUES (%s)"
        % ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r
        )
        for r in ROWS
    )
    store.write(f"tseg{case}", seed)
    store.write(f"tseg{case}", ";\n".join(trigs))
    sq_raised, en_raised = _run_script_both(conn, store, f"tseg{case}", stmts)
    assert sq_raised == en_raised, (
        f"\ntriggers: {trigs}\nscript: {stmts}\n"
        f"sqlite raised: {sq_raised}, engine raised: {en_raised}"
    )

    for q in (
        "SELECT id, a, b, s FROM nums ORDER BY id",
        "SELECT rid, tag, x FROM audit ORDER BY rid, tag, x",
        "SELECT rid, x FROM audit2 ORDER BY rid, x",
    ):
        expected = [tuple(row) for row in conn.execute(q).fetchall()]
        got = [tuple(r.values()) for r in store.read(f"tseg{case}", q)]
        assert got == expected, (
            f"\ntriggers: {trigs}\nscript: {stmts}\nq: {q}\nsqlite: {expected}\nengine: {got}"
        )


# ---------------------------------------------------------------------------
# round-7 campaign: the interleave/cascade frontier (VERDICT r6 item 5) —
# state-OBSERVING trigger bodies (scalar count/sum subqueries over the
# subject and audit tables) driven by multi-row INSERT VALUES, INSERT..SELECT,
# and multi-row UPDATE/DELETE, plus second-level cascades with WHEN clauses.
# Exercises BOTH branches: _bodies_observe_state -> per-row interleave, and
# state-blind -> batched firing, with raise-outcome comparison throughout.
# ---------------------------------------------------------------------------

N_INTERLEAVE_CASES = _n("TROUGH_FUZZ_INTERLEAVE", 6, 2)


def _observing_trigger_ddl(rng: random.Random, n: int) -> list[str]:
    """Triggers on nums whose bodies OBSERVE state (scalar subqueries over
    nums/audit, UPDATE/DELETE on audit) mixed with state-blind controls.
    Bodies never write nums itself: a body writing the statement's target
    table is SQLite-undefined and the engine rejects it by design."""
    trigs = []
    for i in range(n):
        timing = rng.choice(["BEFORE", "AFTER"])
        event = rng.choice(["INSERT", "UPDATE", "DELETE"])
        row = {"INSERT": "NEW", "UPDATE": rng.choice(["NEW", "OLD"]), "DELETE": "OLD"}[event]
        when = ""
        if rng.random() < 0.4:
            when = rng.choice(
                [
                    f"WHEN {row}.id > {rng.randint(0, 5)} ",
                    f"WHEN coalesce({row}.a, 0) >= {rng.randint(-5, 5)} ",
                ]
            )
        body = rng.choice(
            [
                f"INSERT INTO audit VALUES ({row}.id, 'n{i}', (SELECT count(*) FROM nums));",
                f"INSERT INTO audit VALUES ({row}.id, 'a{i}', (SELECT count(*) FROM audit));",
                f"INSERT INTO audit VALUES ({row}.id, 's{i}', (SELECT coalesce(sum(a), 0) FROM nums));",
                f"UPDATE audit SET x = x + 1 WHERE rid = {row}.id;",
                f"DELETE FROM audit WHERE rid = {row}.id AND x < {rng.randint(-2, 2)};",
                f"INSERT INTO audit VALUES ({row}.id, 'k{i}', {row}.id);",  # state-blind
            ]
        )
        trigs.append(
            f"CREATE TRIGGER obs{i} {timing} {event} ON nums "
            f"FOR EACH ROW {when}BEGIN {body} END"
        )
    return trigs


def _observing_cascade_ddl(rng: random.Random) -> list[str]:
    """Second-level triggers ON audit with WHEN clauses whose bodies may
    observe audit2 state — a first-level body INSERT into audit must fire
    these per produced row, interleaved."""
    trigs = []
    for i in range(rng.randint(1, 2)):
        timing = rng.choice(["BEFORE", "AFTER"])
        when = ""
        if rng.random() < 0.6:
            when = f"WHEN coalesce(NEW.x, 0) >= {rng.randint(-5, 8)} "
        body = rng.choice(
            [
                "INSERT INTO audit2 VALUES (NEW.rid, (SELECT count(*) FROM audit2));",
                "INSERT INTO audit2 VALUES (NEW.rid, (SELECT count(*) FROM audit));",
                "INSERT INTO audit2 VALUES (NEW.rid, coalesce(NEW.x, -1));",
            ]
        )
        trigs.append(
            f"CREATE TRIGGER obsc{i} {timing} INSERT ON audit "
            f"FOR EACH ROW {when}BEGIN {body} END"
        )
    return trigs


def _interleave_script(rng: random.Random) -> list[str]:
    """Multi-row statements that force the per-row interleave when bodies
    observe state: multi-row INSERT VALUES, INSERT..SELECT, broad UPDATE /
    DELETE; plus single-row INSERTs whose VALUES carry state subqueries
    (multi-row VALUES + state subqueries stays out: documented reject)."""
    stmts = []
    next_id = 300
    for _ in range(rng.randint(2, 4)):
        kind = rng.randrange(6)
        if kind == 5:
            # OR IGNORE with ids that may collide (existing 1-5 plus each
            # other): probed semantics — BEFORE fires per row, conflicting
            # rows skip their insert and AFTER
            nrows = rng.randint(2, 3)
            ids = [rng.choice([rng.randint(1, 6), next_id + j]) for j in range(nrows)]
            vals = ", ".join(
                f"({i}, {rng.randint(-9, 9)}, {rng.randint(-9, 9)}, 'g')" for i in ids
            )
            stmts.append(f"INSERT OR IGNORE INTO nums (id, a, b, s) VALUES {vals}")
            next_id += nrows + 1
            continue
        if kind == 0:
            nrows = rng.randint(2, 4)
            vals = ", ".join(
                f"({next_id + j}, {rng.choice(['NULL', str(rng.randint(-9, 9))])}, "
                f"{rng.randint(-9, 9)}, 'm')"
                for j in range(nrows)
            )
            stmts.append(f"INSERT INTO nums (id, a, b, s) VALUES {vals}")
            next_id += nrows + 1
        elif kind == 1:
            off = rng.randint(40, 70)
            stmts.append(
                f"INSERT INTO nums (id, a, b, s) "
                f"SELECT id + {off}, b, a, s FROM nums WHERE id < {rng.randint(3, 6)}"
            )
        elif kind == 2:
            stmts.append(
                f"UPDATE nums SET a = coalesce(a, 0) + {rng.randint(1, 3)} "
                f"WHERE id % {rng.randint(2, 3)} = {rng.randint(0, 1)}"
            )
        elif kind == 3:
            stmts.append(f"DELETE FROM nums WHERE id % {rng.randint(3, 5)} = 0")
        else:
            src = rng.choice(["nums", "audit"])
            stmts.append(
                f"INSERT INTO nums (id, a, b, s) VALUES "
                f"({next_id}, (SELECT count(*) FROM {src}), 0, 'q')"
            )
            next_id += 1
    return stmts


@pytest.mark.parametrize("case", range(N_INTERLEAVE_CASES))
def test_fuzzed_interleave_triggers_match_sqlite(spark, tmp_path, case):
    rng = random.Random(SEED + 900 + case)
    trigs = _observing_trigger_ddl(rng, rng.randint(1, 3))
    if rng.random() < 0.7:
        trigs += _observing_cascade_ddl(rng)
    stmts = _interleave_script(rng)

    conn = sqlite3.connect(":memory:")
    conn.isolation_level = None
    conn.executescript(TRIG_DDL)
    conn.executemany("INSERT INTO nums VALUES (?, ?, ?, ?)", ROWS)
    conn.commit()
    for t in trigs:
        conn.execute(t)
    conn.commit()

    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("itr_schema", TRIG_DDL + ";")
    store.provision(f"iseg{case}", "itr_schema")
    seed = ";\n".join(
        "INSERT INTO nums (id, a, b, s) VALUES (%s)"
        % ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r
        )
        for r in ROWS
    )
    store.write(f"iseg{case}", seed)
    store.write(f"iseg{case}", ";\n".join(trigs))
    sq_raised, en_raised = _run_script_both(conn, store, f"iseg{case}", stmts)
    assert sq_raised == en_raised, (
        f"\ntriggers: {trigs}\nscript: {stmts}\n"
        f"sqlite raised: {sq_raised}, engine raised: {en_raised}"
    )
    for q in (
        "SELECT id, a, b, s FROM nums ORDER BY id",
        "SELECT rid, tag, x FROM audit ORDER BY rid, tag, x",
        "SELECT rid, x FROM audit2 ORDER BY rid, x",
    ):
        expected = [tuple(row) for row in conn.execute(q).fetchall()]
        got = [tuple(r.values()) for r in store.read(f"iseg{case}", q)]
        assert got == expected, (
            f"\ntriggers: {trigs}\nscript: {stmts}\nq: {q}\nsqlite: {expected}\nengine: {got}"
        )


N_CONFLICT_CASES = _n("TROUGH_FUZZ_CONFLICT", 6, 2)


def _conflict_script(rng: random.Random) -> list[str]:
    """Conflict-resolving statements against triggered nums: OR REPLACE
    (both spellings), ON CONFLICT(id) DO UPDATE with excluded./bare/
    table-qualified refs and optional WHERE gates, and plain inserts —
    ids chosen to collide with seeded rows AND within one statement
    (SQLite applies multi-row conflicts sequentially; so does the engine's
    per-row triggered loop)."""
    stmts = []
    next_id = 500
    for _ in range(rng.randint(2, 4)):
        kind = rng.randrange(3)
        nrows = rng.randint(1, 3)
        ids = [rng.choice([rng.randint(1, 6), next_id + j]) for j in range(nrows)]
        vals = ", ".join(
            f"({i}, {rng.choice(['NULL', str(rng.randint(-9, 9))])}, "
            f"{rng.randint(-9, 9)}, '{rng.choice('xyz')}')"
            for i in ids
        )
        if kind == 0:
            form = rng.choice(["INSERT OR REPLACE INTO", "REPLACE INTO"])
            stmts.append(f"{form} nums (id, a, b, s) VALUES {vals}")
        elif kind == 1:
            set_expr = rng.choice(
                [
                    "a = excluded.a",
                    "a = coalesce(a, 0) + coalesce(excluded.a, 0)",
                    "b = nums.b + excluded.b, s = s || '+'",
                    "s = excluded.s || coalesce(s, '_')",
                ]
            )
            where = ""
            if rng.random() < 0.5:
                where = rng.choice(
                    [
                        " WHERE excluded.b > b",
                        " WHERE coalesce(excluded.a, 0) >= coalesce(a, 0)",
                        " WHERE nums.b < 0",
                    ]
                )
            stmts.append(
                f"INSERT INTO nums (id, a, b, s) VALUES {vals} "
                f"ON CONFLICT (id) DO UPDATE SET {set_expr}{where}"
            )
        else:
            stmts.append(f"INSERT INTO nums (id, a, b, s) VALUES {vals}")
        next_id += nrows + 1
    return stmts


@pytest.mark.parametrize("case", range(N_CONFLICT_CASES))
def test_fuzzed_conflict_forms_on_triggers_match_sqlite(spark, tmp_path, case):
    """Round-7 conflict-forms × triggers frontier: randomized OR REPLACE /
    DO UPDATE scripts on a table with state-observing INSERT and UPDATE
    triggers (plus cascades), differentialed against live SQLite — final
    table state, both audit trails, and error outcomes must all agree."""
    rng = random.Random(SEED + 1200 + case)
    trigs = _observing_trigger_ddl(rng, rng.randint(1, 3))
    if rng.random() < 0.7:
        trigs += _observing_cascade_ddl(rng)
    if rng.random() < 0.5:
        # RAISE(IGNORE) in BEFORE INSERT: probed — fires before any
        # conflict resolution, so an ignored row's REPLACE/DO UPDATE
        # never happens and the existing row stays
        trigs.append(
            "CREATE TRIGGER obsig BEFORE INSERT ON nums FOR EACH ROW "
            f"WHEN NEW.id % {rng.randint(2, 4)} = 0 "
            "BEGIN SELECT RAISE(IGNORE); END"
        )
    stmts = _conflict_script(rng)

    conn = sqlite3.connect(":memory:")
    conn.isolation_level = None
    conn.executescript(TRIG_DDL)
    conn.executemany("INSERT INTO nums VALUES (?, ?, ?, ?)", ROWS)
    conn.commit()
    for t in trigs:
        conn.execute(t)
    conn.commit()

    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("cfl_schema", TRIG_DDL + ";")
    store.provision(f"cseg{case}", "cfl_schema")
    seed = ";\n".join(
        "INSERT INTO nums (id, a, b, s) VALUES (%s)"
        % ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r
        )
        for r in ROWS
    )
    store.write(f"cseg{case}", seed)
    store.write(f"cseg{case}", ";\n".join(trigs))
    sq_raised, en_raised = _run_script_both(conn, store, f"cseg{case}", stmts)
    assert sq_raised == en_raised, (
        f"\ntriggers: {trigs}\nscript: {stmts}\n"
        f"sqlite raised: {sq_raised}, engine raised: {en_raised}"
    )
    for q in (
        "SELECT id, a, b, s FROM nums ORDER BY id",
        "SELECT rid, tag, x FROM audit ORDER BY rid, tag, x",
        "SELECT rid, x FROM audit2 ORDER BY rid, x",
    ):
        expected = [tuple(row) for row in conn.execute(q).fetchall()]
        got = [tuple(r.values()) for r in store.read(f"cseg{case}", q)]
        assert got == expected, (
            f"\ntriggers: {trigs}\nscript: {stmts}\nq: {q}\n"
            f"sqlite: {expected}\nengine: {got}"
        )


# -- round-8 campaign: UPDATE OR IGNORE/REPLACE x triggers x pk shapes -------
#
# VERDICT r7 item 7: the round-7 position-visit model was fuzzed on a fixed
# dense seed; this campaign varies the pk SHAPE (dense chase-fodder blocks,
# sparse ids, mixed runs), adds WHEN-clause triggers and UPDATE OF triggers
# on columns DISJOINT from the script's SET lists (the engine supports that
# combination — OF-matching triggers stay a documented loud reject, pinned
# separately below), interleaves plain INSERT/DELETE so the trigger
# machinery runs inside the same script, and occasionally sets the rowid
# pk to NULL (SQLite: "datatype mismatch" even under OR IGNORE — probed
# round 8, previously a silent divergence).

N_UPDATE_OR_CASES = _n("TROUGH_FUZZ_UPDATE_OR", 8, 2)


def _pk_seed_rows(rng: random.Random) -> list[tuple]:
    shape = rng.randrange(3)
    if shape == 0:
        ids = list(range(1, 7))  # dense: OR REPLACE chase fodder
    elif shape == 1:
        ids = sorted(rng.sample(range(1, 30), 6))  # sparse
    else:
        ids = [1, 2, 3] + sorted(rng.sample(range(7, 25), 3))  # mixed
    return [
        (
            i,
            rng.choice([None, rng.randint(-9, 9)]),
            rng.randint(-9, 9),
            rng.choice([None, "x", "yy", ""]),
        )
        for i in ids
    ]


def _update_or_script(rng: random.Random) -> tuple[list[str], set[str]]:
    """OR-mode updates + plain INSERT/DELETE noise; returns (stmts,
    set_cols) so trigger generation can stay disjoint from every SET."""
    stmts: list[str] = []
    set_cols: set[str] = set()
    next_id = 400
    for _ in range(rng.randint(3, 5)):
        kind = rng.randrange(6)
        if kind == 4:
            a = rng.choice(["NULL", str(rng.randint(-9, 9))])
            stmts.append(
                f"INSERT INTO nums (id, a, b, s) VALUES "
                f"({next_id}, {a}, {rng.randint(-9, 9)}, 'n')"
            )
            next_id += 1
            continue
        if kind == 5:
            stmts.append(f"DELETE FROM nums WHERE id % {rng.randint(3, 5)} = 1")
            continue
        mode = rng.choice(["IGNORE", "REPLACE"])
        if rng.random() < 0.12:
            set_sql = "id = NULL"  # datatype-mismatch parity
            set_cols.add("id")
        elif kind == 0:
            set_sql = f"id = id {rng.choice(['+', '-'])} {rng.randint(1, 3)}"
            set_cols.add("id")
        elif kind == 1:
            set_sql = rng.choice(
                [f"id = {rng.randint(1, 12)}", f"id = {rng.randint(6, 14)} - id"]
            )
            set_cols.add("id")
        elif kind == 2:
            set_sql = f"id = id + {rng.randint(1, 2)}, a = coalesce(a, 0) + 1"
            set_cols.update(("id", "a"))
        else:
            set_sql = "a = coalesce(a, 0) * 2"
            set_cols.add("a")
        where = ""
        if rng.random() < 0.7:
            where = " WHERE " + rng.choice(
                [
                    f"id < {rng.randint(2, 14)}",
                    f"id > {rng.randint(0, 8)}",
                    f"id % {rng.randint(2, 4)} = 0",
                    "a IS NULL",
                    f"coalesce(b, 0) >= {rng.randint(-4, 8)}",
                ]
            )
        stmts.append(f"UPDATE OR {mode} nums SET {set_sql}{where}")
    return stmts, set_cols


def _disjoint_trigger_ddl(
    rng: random.Random, set_cols: set[str]
) -> list[str]:
    """INSERT/DELETE triggers (fire from the noise statements) plus UPDATE
    OF triggers restricted to columns no OR-mode statement sets."""
    trigs = []
    free = [c for c in ("a", "b", "s") if c not in set_cols]
    for i in range(rng.randint(1, 3)):
        event = rng.choice(["INSERT", "DELETE"] + (["UPDATE"] if free else []))
        timing = rng.choice(["BEFORE", "AFTER"])
        row = {"INSERT": "NEW", "UPDATE": rng.choice(["NEW", "OLD"]), "DELETE": "OLD"}[
            event
        ]
        of = f" OF {rng.choice(free)}" if event == "UPDATE" else ""
        when = ""
        if rng.random() < 0.6:
            when = rng.choice(
                [
                    f"WHEN {row}.id > {rng.randint(0, 6)} ",
                    f"WHEN {row}.a IS NOT NULL ",
                    f"WHEN coalesce({row}.b, 0) >= {rng.randint(-5, 5)} ",
                ]
            )
        trigs.append(
            f"CREATE TRIGGER uor{i} {timing} {event}{of} ON nums "
            f"FOR EACH ROW {when}BEGIN INSERT INTO audit VALUES "
            f"({row}.id, '{event[:3].lower()}{i}', coalesce({row}.b, -99)); END"
        )
    return trigs


@pytest.mark.parametrize("case", range(N_UPDATE_OR_CASES))
def test_fuzzed_update_or_modes_match_sqlite(spark, tmp_path, case):
    rng = random.Random(SEED + 1500 + case)
    seed_rows = _pk_seed_rows(rng)
    stmts, set_cols = _update_or_script(rng)
    trigs = _disjoint_trigger_ddl(rng, set_cols)
    # the campaign cycles the pk DECLARATION across the three spellings
    # whose chase semantics must agree: the column-level rowid alias, the
    # TABLE-CONSTRAINT alias (`id INTEGER, PRIMARY KEY (id)` — classified
    # identically since round 8), and WITHOUT ROWID (the btree key IS the
    # pk, so the same pk-order visit applies; NULL-id SETs hit NOT NULL
    # instead of datatype mismatch — probed, both engines agree)
    ddl = TRIG_DDL
    base = "CREATE TABLE nums (id INTEGER PRIMARY KEY, a INTEGER, b INTEGER, s TEXT)"
    if case % 3 == 1:
        ddl = ddl.replace(
            base,
            "CREATE TABLE nums (id INTEGER, a INTEGER, b INTEGER, s TEXT, "
            "PRIMARY KEY (id))",
        )
        assert "PRIMARY KEY (id)" in ddl
    elif case % 3 == 2:
        ddl = ddl.replace(base, base + " WITHOUT ROWID")
        assert "WITHOUT ROWID" in ddl

    conn = sqlite3.connect(":memory:")
    conn.isolation_level = None
    conn.executescript(ddl)
    conn.executemany("INSERT INTO nums VALUES (?, ?, ?, ?)", seed_rows)
    conn.commit()
    for t in trigs:
        conn.execute(t)
    conn.commit()

    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("uor8_schema", ddl + ";")
    store.provision(f"useg{case}", "uor8_schema")
    seed = ";\n".join(
        "INSERT INTO nums (id, a, b, s) VALUES (%s)"
        % ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r
        )
        for r in seed_rows
    )
    store.write(f"useg{case}", seed)
    store.write(f"useg{case}", ";\n".join(trigs))
    sq_raised, en_raised = _run_script_both(conn, store, f"useg{case}", stmts)
    assert sq_raised == en_raised, (
        f"\nseed: {seed_rows}\ntriggers: {trigs}\nscript: {stmts}\n"
        f"sqlite raised: {sq_raised}, engine raised: {en_raised}"
    )
    for q in (
        "SELECT id, a, b, s FROM nums ORDER BY id",
        "SELECT rid, tag, x FROM audit ORDER BY rid, tag, x",
    ):
        expected = [tuple(row) for row in conn.execute(q).fetchall()]
        got = [tuple(r.values()) for r in store.read(f"useg{case}", q)]
        assert got == expected, (
            f"\nseed: {seed_rows}\ntriggers: {trigs}\nscript: {stmts}\nq: {q}\n"
            f"sqlite: {expected}\nengine: {got}"
        )


def test_update_or_mode_matching_trigger_rejects_loudly(spark, tmp_path):
    """The OF-matching combination stays a DOCUMENTED loud reject: an
    UPDATE OR mode whose SET list overlaps an UPDATE trigger's columns
    (or hits a no-OF UPDATE trigger) raises QueryRejected rather than
    silently skipping the firing interplay."""
    from trough_spark.dialect import QueryRejected

    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("uorrej_schema", TRIG_DDL + ";")
    store.provision("urseg", "uorrej_schema")
    store.write("urseg", "INSERT INTO nums (id, a, b, s) VALUES (1, 1, 1, 'x')")
    store.write(
        "urseg",
        "CREATE TRIGGER tr_any AFTER UPDATE ON nums FOR EACH ROW "
        "BEGIN INSERT INTO audit VALUES (NEW.id, 'u', 0); END",
    )
    with pytest.raises(QueryRejected, match="trigger"):
        store.write("urseg", "UPDATE OR IGNORE nums SET a = a + 1")
    store.write("urseg", "DROP TRIGGER tr_any")
    store.write(
        "urseg",
        "CREATE TRIGGER tr_of AFTER UPDATE OF a ON nums FOR EACH ROW "
        "BEGIN INSERT INTO audit VALUES (NEW.id, 'ua', 0); END",
    )
    with pytest.raises(QueryRejected, match="trigger"):
        store.write("urseg", "UPDATE OR REPLACE nums SET a = 5, id = 2")


# -- round-8 campaign: UNIQUE constraints x collations x conflict forms ------
#
# The round-8 UNIQUE/collation support (tests/test_unique_constraints.py
# pins the probed rules one by one) gets a seeded grammar fuzzer: random
# schemas over {INTEGER pk / NOCASE TEXT pk / pk-less} x {column UNIQUE,
# collated UNIQUE, composite UNIQUE}, scripts mixing plain INSERT,
# OR IGNORE / OR REPLACE multi-row VALUES, ON CONFLICT DO NOTHING (with
# and without target), DO UPDATE (excluded. refs), plain UPDATE/DELETE —
# executed as ONE transaction on both engines, comparing raise/no-raise
# and full final state.  Values are case-variants and trailing-space
# variants so the NOCASE/RTRIM folds and NULL coexistence are exercised
# constantly.  (UPDATE OR modes and triggers are excluded: documented loud
# rejects on extended-uniqueness tables.)

N_UNIQUE_CASES = _n("TROUGH_FUZZ_UNIQUE", 10, 3)

_UVALS = ["'A'", "'a'", "'Xy'", "'xY'", "'b '", "'b  '", "'b'", "'z'", "NULL"]


def _unique_schema(rng: random.Random) -> tuple[str, bool]:
    """(ddl, has_pk): one table `t` with a random uniqueness landscape."""
    shape = rng.randrange(3)
    if shape == 0:
        pk, has_pk = "id INTEGER PRIMARY KEY", True
    elif shape == 1:
        pk, has_pk = "id TEXT PRIMARY KEY COLLATE NOCASE", True
    else:
        pk, has_pk = "id INTEGER", False
    ucoll = rng.choice(["", " COLLATE NOCASE", " COLLATE RTRIM"])
    cols = [pk, f"u TEXT UNIQUE{ucoll}", "a INTEGER", "b TEXT"]
    tail = ""
    if rng.random() < 0.4:
        tail = ", UNIQUE (a, b)"
    return f"CREATE TABLE t ({', '.join(cols)}{tail})", has_pk


def _unique_script(rng: random.Random, has_pk: bool, text_pk: bool) -> list[str]:
    def idv(n: int) -> str:
        return f"'k{n % 4}{'A' if n % 2 else 'a'}'" if text_pk else str(n)

    stmts = []
    n = 1
    for _ in range(rng.randint(4, 7)):
        kind = rng.randrange(8)
        u = rng.choice(_UVALS)
        a = rng.choice(["NULL", str(rng.randint(0, 2))])
        b = rng.choice(["NULL", "'p'", "'q'"])
        vals = f"({idv(n)}, {u}, {a}, {b})"
        n += 1
        if kind in (0, 1):
            stmts.append(f"INSERT INTO t VALUES {vals}")
        elif kind == 2:
            v2 = f"({idv(n)}, {rng.choice(_UVALS)}, {a}, {b})"
            n += 1
            stmts.append(f"INSERT OR IGNORE INTO t VALUES {vals}, {v2}")
        elif kind == 3:
            v2 = f"({idv(n)}, {rng.choice(_UVALS)}, {a}, {b})"
            n += 1
            stmts.append(f"INSERT OR REPLACE INTO t VALUES {vals}, {v2}")
        elif kind == 4 and has_pk:
            tgt = rng.choice(["", "(id)", "(u)"])
            stmts.append(
                f"INSERT INTO t VALUES {vals} ON CONFLICT{tgt} DO NOTHING"
            )
        elif kind == 5 and has_pk:
            # SET stays off every constraint column (engine reject scope)
            tgt = rng.choice(["(id)", "(u)"])
            stmts.append(
                f"INSERT INTO t VALUES {vals} ON CONFLICT{tgt} "
                f"DO UPDATE SET b = coalesce(excluded.b, t.b), "
                f"a = coalesce(t.a, 0) + 1"
            )
        elif kind == 6:
            stmts.append(
                f"UPDATE t SET u = {rng.choice(_UVALS)} "
                f"WHERE a = {rng.randint(0, 2)}"
            )
        else:
            stmts.append(f"DELETE FROM t WHERE a = {rng.randint(0, 2)}")
    return stmts


@pytest.mark.parametrize("case", range(N_UNIQUE_CASES))
def test_fuzzed_unique_constraints_match_sqlite(spark, tmp_path, case):
    rng = random.Random(SEED + 2000 + case)
    ddl, has_pk = _unique_schema(rng)
    text_pk = "TEXT PRIMARY KEY" in ddl
    stmts = _unique_script(rng, has_pk, text_pk)

    conn = sqlite3.connect(":memory:")
    conn.isolation_level = None
    conn.executescript(ddl + ";")
    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("uq8", ddl + ";")
    store.provision(f"uqseg{case}", "uq8")

    sq_raised, en_raised = _run_script_both(conn, store, f"uqseg{case}", stmts)
    assert sq_raised == en_raised, (
        f"\nddl: {ddl}\nscript: {stmts}\n"
        f"sqlite raised: {sq_raised}, engine raised: {en_raised}"
    )
    q = "SELECT id, u, a, b FROM t ORDER BY coalesce(CAST(id AS TEXT),''), coalesce(u,''), coalesce(a,-1)"
    expected = [tuple(row) for row in conn.execute(q).fetchall()]
    got = [tuple(r.values()) for r in store.read(f"uqseg{case}", q)]
    assert got == expected, (
        f"\nddl: {ddl}\nscript: {stmts}\nsqlite: {expected}\nengine: {got}"
    )


# ---------------------------------------------------------------------------
# round-8 campaign: RETURNING clauses across the write surface
#
# Each DML statement of a random write script (the same grammar as the
# write campaign: plain/conflict-form INSERTs, UPDATE incl. OR modes,
# DELETE) gets a random RETURNING clause — bare/qualified columns, rowid,
# expressions, *, aliases.  Statements run ONE AT A TIME on both engines
# (sqlite3 autocommit) so each statement's returned rows can be compared;
# SQLite documents RETURNING output order as undefined, so rows compare as
# sorted multisets.  Errors may legitimately occur (dup pk, CHECK) — both
# engines must agree per statement, and final state must match.
# ---------------------------------------------------------------------------
N_RETURNING_CASES = _n("TROUGH_FUZZ_RETURNING", 8, 2)

_RET_CLAUSES = [
    "*",
    "id",
    "rowid",
    "nums.id, nums.s",
    "id, a*2 AS d",
    "coalesce(a, 0) + coalesce(b, 0) AS t",
    "upper(coalesce(s, '')) us, id",
    "id + 1",
    "a IS NOT NULL, id",
    "min(id, 50), max(coalesce(a, 0), coalesce(b, 0)) AS mx",
]


def _returning_script(rng: random.Random) -> list[str]:
    stmts = _write_script(rng)
    out = []
    for s in stmts:
        up = s.upper()
        if up.startswith("UPDATE OR"):
            # UPDATE OR modes keep a plain clause (the chase path captures
            # applied rows only)
            clause = rng.choice(["id", "*", "id, a"])
            out.append(f"{s} RETURNING {clause}")
        elif rng.random() < 0.8:
            out.append(f"{s} RETURNING {rng.choice(_RET_CLAUSES)}")
        else:
            out.append(s)
    return out


@pytest.mark.parametrize("case", range(N_RETURNING_CASES))
def test_fuzzed_returning_matches_sqlite(spark, tmp_path, case):
    rng = random.Random(SEED + 900 + case)
    ddl = DDL
    if rng.random() < 0.4:
        ddl = DDL[:-1] + ", CHECK (b IS NULL OR b < 60))"
    stmts = _returning_script(rng)

    conn = sqlite3.connect(":memory:")
    conn.execute(ddl)
    conn.executemany("INSERT INTO nums VALUES (?, ?, ?, ?)", ROWS)
    conn.commit()

    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("nums_schema", ddl + ";")
    store.provision(f"rseg{case}", "nums_schema")
    seed = ";\n".join(
        "INSERT INTO nums (id, a, b, s) VALUES (%s)"
        % ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r
        )
        for r in ROWS
    )
    store.write(f"rseg{case}", seed)

    for i, s in enumerate(stmts):
        sq_err, sq_rows = None, []
        try:
            cur = conn.execute(s)
            if cur.description:
                cols = [c[0] for c in cur.description]
                sq_rows = [dict(zip(cols, r)) for r in cur.fetchall()]
            conn.commit()
        except sqlite3.Error as e:
            sq_err = str(e)
            conn.rollback()
        en_err, en_rows = None, []
        try:
            en_rows = store.write(f"rseg{case}", s)
        except Exception as e:
            en_err = str(e)
        assert (sq_err is None) == (en_err is None), (
            f"\nstmt {i}: {s}\nsqlite: {sq_err!r}\nengine: {en_err!r}"
        )
        canon = lambda rows: sorted(  # noqa: E731
            sorted((k, repr(v)) for k, v in dict(r).items()) for r in rows
        )
        assert canon(sq_rows) == canon(en_rows), (
            f"\nstmt {i}: {s}\nsqlite: {sq_rows!r}\nengine: {en_rows!r}"
        )

    q = "SELECT id, a, b, s FROM nums ORDER BY id"
    expected = [tuple(row) for row in conn.execute(q).fetchall()]
    got = [
        (r["id"], r["a"], r["b"], r["s"])
        for r in store.read(f"rseg{case}", q)
    ]
    assert got == expected, f"\nscript: {stmts}\nsqlite: {expected}\nengine: {got}"


# ---------------------------------------------------------------------------
# round-8 campaign: generated columns across the write surface
#
# The write-script grammar (plain/conflict-form INSERTs, UPDATE incl. OR
# modes, DELETE — all naming base columns only) runs against a table
# extended with one or two random generated columns (possibly chained,
# occasionally CHECK-guarded).  Every write path must recompute them
# identically to live SQLite; final state INCLUDING the generated values
# is compared, plus per-script raise/no-raise.
# ---------------------------------------------------------------------------
N_GENERATED_CASES = _n("TROUGH_FUZZ_GENERATED", 6, 2)

_GEN_EXPRS_1 = [
    "a + b",
    "a * 2",
    "coalesce(a, 0) - coalesce(b, 0)",
    "abs(b)",
    "min(a, b)",
    "max(a, 0)",
    "length(s)",
    "upper(s)",
    "substr(s, 1, 2)",
    "CASE WHEN a > 0 THEN a ELSE b END",
    "a % 5",
]
_GEN_EXPRS_2 = ["g1 + 1", "g1 * 2", "coalesce(g1, -1)", "min(g1, a)"]


@pytest.mark.parametrize("case", range(N_GENERATED_CASES))
def test_fuzzed_generated_columns_match_sqlite(spark, tmp_path, case):
    rng = random.Random(SEED + 1300 + case)
    e1 = rng.choice(_GEN_EXPRS_1)
    t1 = "TEXT" if e1 in ("upper(s)", "substr(s, 1, 2)") else "INTEGER"
    cols = [f"g1 {t1} AS ({e1})"]
    sel = "id, a, b, s, g1"
    if rng.random() < 0.6:
        pool2 = _GEN_EXPRS_2 + _GEN_EXPRS_1
        if t1 == "TEXT":
            # with a TEXT g1, min(g1, a) hits SQLite's cross-storage-class
            # ordering and coalesce(g1, -1) its lossless-only INTEGER
            # affinity (text stays text in an INTEGER column) — both are
            # the documented SURVEY 7.4 dynamic-typing divergence, not
            # this campaign's target; the arithmetic forms coerce like
            # SQLite and stay in
            pool2 = [
                e for e in pool2
                if e not in ("min(g1, a)", "coalesce(g1, -1)")
            ]
        e2 = rng.choice(pool2)
        stored = " STORED" if rng.random() < 0.5 else ""
        # declared type per expression shape: an untyped generated column
        # keeps SQLite's dynamic result type, which the engine's declared-
        # schema model doesn't reproduce (documented SURVEY 7.4 divergence)
        t2 = "TEXT" if e2 in ("upper(s)", "substr(s, 1, 2)") else "INTEGER"
        cols.append(f"g2 {t2} AS ({e2}){stored}")
        sel += ", g2"
    ddl = DDL[:-1] + ", " + ", ".join(cols) + ")"
    if t1 == "INTEGER" and rng.random() < 0.3:
        # numeric g1 only: a TEXT g1 hits SQLite's empty-string-vs-integer
        # CHECK affinity corner, which is its own probe, not this campaign's
        ddl = ddl[:-1] + ", CHECK (g1 IS NULL OR g1 > -1000))"
    stmts = _write_script(rng)

    conn = sqlite3.connect(":memory:")
    conn.isolation_level = None
    conn.execute(ddl)
    conn.executemany("INSERT INTO nums (id, a, b, s) VALUES (?, ?, ?, ?)", ROWS)
    conn.commit()

    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("nums_schema", ddl + ";")
    store.provision(f"gseg{case}", "nums_schema")
    seed = ";\n".join(
        "INSERT INTO nums (id, a, b, s) VALUES (%s)"
        % ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r
        )
        for r in ROWS
    )
    store.write(f"gseg{case}", seed)
    sq_raised, en_raised = _run_script_both(conn, store, f"gseg{case}", stmts)
    assert sq_raised == en_raised, (
        f"\nddl: {ddl}\nscript: {stmts}\n"
        f"sqlite raised: {sq_raised}, engine raised: {en_raised}"
    )
    q = f"SELECT {sel} FROM nums ORDER BY id"
    expected = [tuple(row) for row in conn.execute(q).fetchall()]
    got = [tuple(r.values()) for r in store.read(f"gseg{case}", q)]
    assert got == expected, (
        f"\nddl: {ddl}\nscript: {stmts}\nsqlite: {expected}\nengine: {got}"
    )


# ---------------------------------------------------------------------------
# round-10 campaign: json-family differential (VERDICT r9 item 8)
#
# Random JSON documents (nested objects/arrays, corner-case keys and string
# values crossing the literal-respelling pass) x random paths x
# json_each / json_tree / json_extract, against live SQLite.  The hand
# cases in test_sqlite_differential pin known corners; this sweeps the
# combination space (the r5 GLOB-sweep precedent).
#
# Deliberate generator constraints, each tracking a DOCUMENTED divergence:
# - keys holding CONTAINER values come from the bare-identifier alphabet
#   (the runtime bracket re-extraction path cannot spell ' / ] / \\ keys —
#   documented at dialect._json_each_subquery);
# - json_tree 2-arg paths never CONTAIN an array index (SQLite zeroes
#   every index in the threaded fullkey/path rendering — probed
#   '$.a[1]' -> '$.a[0]' and '$.key[1].q7x' -> '$.key[0].q7x', the latter
#   found BY this campaign's wide sweep — a quirk the shim intentionally
#   does not reproduce, rendering the path as given);
# - json_extract targets carry no booleans (SQLite returns INTEGER 1/0,
#   get_json_object the text 'true'/'false' — the documented dynamic-
#   typing divergence; json_each/json_tree DO cover booleans through
#   their CAST-to-TEXT value contract);
# - no duplicate keys, ASCII only, floats on .5 steps.
# ---------------------------------------------------------------------------

N_JSON_CASES = _n("TROUGH_FUZZ_JSON", 14, 8)

_J_SAFE_KEYS = ["a", "b2", "key", "Zz", "q7x", "m"]
_J_NASTY_KEYS = ["k 1", "a.b", "x-y", "_lead", "0num", "100%", "sp  sp"]
_J_STRINGS = ["plain", "it's", "c:\\dir\\f", "100%done", "", "two  spaces", "a,b", "[1]"]


def _gen_json(rng, depth: int, allow_bool: bool):
    r = rng.random()
    if depth <= 0 or r < 0.40:
        choice = rng.randint(0, 5)
        if choice == 0:
            return rng.randint(-5, 99)
        if choice == 1 and allow_bool:
            return rng.random() < 0.5
        if choice == 2:
            return None
        if choice == 3:
            return rng.randint(0, 40) + 0.5
        return rng.choice(_J_STRINGS)
    if r < 0.75:
        keys = rng.sample(_J_SAFE_KEYS, rng.randint(1, 3))
        obj = {k: _gen_json(rng, depth - 1, allow_bool) for k in keys}
        if rng.random() < 0.5:
            # nasty keys hold SCALARS only (see constraints above)
            obj[rng.choice(_J_NASTY_KEYS)] = _gen_json(rng, 0, allow_bool)
        return obj
    return [_gen_json(rng, depth - 1, allow_bool) for _ in range(rng.randint(0, 4))]


def _json_paths(doc, prefix: str = "$"):
    """(sqlite-spelled path, value) for every addressable node."""
    out = []
    if isinstance(doc, dict):
        for k, v in doc.items():
            if re.fullmatch(r"[A-Za-z][A-Za-z0-9]*", k):
                p = f"{prefix}.{k}"
            elif "'" in k or '"' in k or "\\" in k:
                continue  # not addressable through the shim's path grammar
            else:
                p = f'{prefix}."{k}"'
            out.append((p, v))
            out.extend(_json_paths(v, p))
    elif isinstance(doc, list):
        for i, v in enumerate(doc):
            p = f"{prefix}[{i}]"
            out.append((p, v))
            out.extend(_json_paths(v, p))
    return out


_JE_COLS = (
    "CAST(key AS TEXT) AS k, CAST(value AS TEXT) AS v, type, "
    "CAST(atom AS TEXT) AS a, fullkey, path"
)


def _json_queries() -> list[str]:
    import json as _json

    rng = random.Random(SEED + 10)
    out = []
    while len(out) < N_JSON_CASES:
        form = len(out) % 5
        doc = _gen_json(rng, 3, allow_bool=form != 4)
        paths = _json_paths(doc)
        doc_sql = _json.dumps(doc, separators=(",", ":")).replace("'", "''")
        if form == 0:
            out.append(
                f"SELECT {_JE_COLS} FROM json_each('{doc_sql}') ORDER BY fullkey"
            )
        elif form == 1:
            cands = [p for p, _ in paths] + ["$.zz9"]
            # index-ending paths only when the target is a scalar (the
            # container-at-index fullkey threading is json_tree's quirk)
            cands = [
                p
                for p in cands
                if not p.endswith("]")
                or not isinstance(dict(paths).get(p), (dict, list))
            ]
            if not cands:
                continue
            p = rng.choice(cands).replace("'", "''")
            out.append(
                f"SELECT {_JE_COLS} FROM json_each('{doc_sql}', '{p}') "
                f"ORDER BY fullkey"
            )
        elif form == 2:
            out.append(
                f"SELECT {_JE_COLS} FROM json_tree('{doc_sql}') ORDER BY fullkey"
            )
        elif form == 3:
            cands = ["$"] + [p for p, _ in paths if "[" not in p] + ["$.zz9"]
            p = rng.choice(cands).replace("'", "''")
            out.append(
                f"SELECT {_JE_COLS} FROM json_tree('{doc_sql}', '{p}') "
                f"ORDER BY fullkey"
            )
        else:
            if not paths:
                continue
            p = rng.choice([p for p, _ in paths] + ["$.zz9"]).replace("'", "''")
            out.append(
                f"SELECT CAST(json_extract('{doc_sql}', '{p}') AS TEXT) AS v"
            )
    return out


@pytest.mark.parametrize("sql", _json_queries())
def test_fuzzed_json_family_matches_sqlite(engines, sql):
    conn, store = engines
    expected = [tuple(row) for row in conn.execute(sql).fetchall()]
    got = [tuple(r.values()) for r in store.read("fuzzseg", sql)]
    assert got == expected, f"\nsql: {sql}\nsqlite: {expected}\nengine: {got}"


# ---------------------------------------------------------------------------
# round-10: subquery WHEN clauses / RAISE conditions read LIVE state
# (previously a loud reject) — hand differentials pinning the per-row
# evolving-state semantics against live SQLite; the random campaign above
# also draws subquery WHENs now.
# ---------------------------------------------------------------------------


def _run_when_case(spark, tmp_path, tag: str, trigs: list[str], stmts: list[str]):
    conn = sqlite3.connect(":memory:")
    conn.isolation_level = None
    conn.executescript(TRIG_DDL)
    conn.executemany("INSERT INTO nums VALUES (?, ?, ?, ?)", ROWS)
    conn.commit()
    for t in trigs:
        conn.execute(t)
    conn.commit()
    store = SegmentStore(spark, str(tmp_path / f"store_{tag}"))
    store.set_schema(f"wsch_{tag}", TRIG_DDL + ";")
    store.provision(f"wseg_{tag}", f"wsch_{tag}")
    seed = ";\n".join(
        "INSERT INTO nums (id, a, b, s) VALUES (%s)"
        % ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r
        )
        for r in ROWS
    )
    store.write(f"wseg_{tag}", seed)
    store.write(f"wseg_{tag}", ";\n".join(trigs))
    sq_raised, en_raised = _run_script_both(conn, store, f"wseg_{tag}", stmts)
    assert sq_raised == en_raised
    for q in (
        "SELECT id, a, b, s FROM nums ORDER BY id",
        "SELECT rid, tag, x FROM audit ORDER BY rid, tag, x",
    ):
        expected = [tuple(row) for row in conn.execute(q).fetchall()]
        got = [tuple(r.values()) for r in store.read(f"wseg_{tag}", q)]
        assert got == expected, (
            f"\ntriggers: {trigs}\nscript: {stmts}\nq: {q}\n"
            f"sqlite: {expected}\nengine: {got}"
        )


def test_subquery_when_sees_evolving_state(spark, tmp_path):
    """A BEFORE-INSERT WHEN counting the audit table must see each prior
    row's body INSERT: across a multi-row insert the count crosses the
    threshold mid-statement and later rows stop firing — the per-row
    live-state semantics SQLite implements and round 9 rejected loudly."""
    trigs = [
        "CREATE TRIGGER tw1 BEFORE INSERT ON nums FOR EACH ROW "
        "WHEN (SELECT COUNT(*) FROM audit) < 2 "
        "BEGIN INSERT INTO audit VALUES (NEW.id, 'w', NEW.a); END"
    ]
    stmts = [
        "INSERT INTO nums (id, a, b, s) VALUES "
        "(101, 1, 0, 'a'), (102, 2, 0, 'b'), (103, 3, 0, 'c'), (104, 4, 0, 'd')"
    ]
    _run_when_case(spark, tmp_path, "evolve", trigs, stmts)


def test_subquery_when_reads_triggering_table(spark, tmp_path):
    """The WHEN's subquery reads the TRIGGERING table itself mid
    multi-row statement (AFTER insert: each fired row sees itself and
    all prior rows already applied)."""
    trigs = [
        "CREATE TRIGGER tw2 AFTER INSERT ON nums FOR EACH ROW "
        "WHEN (SELECT COUNT(*) FROM nums) % 2 = 0 "
        "BEGIN INSERT INTO audit VALUES (NEW.id, 'even', NEW.a); END"
    ]
    stmts = [
        "INSERT INTO nums (id, a, b, s) VALUES "
        "(201, 1, 0, 'a'), (202, 2, 0, 'b'), (203, 3, 0, 'c')",
        "DELETE FROM nums WHERE id = 202",
        "INSERT INTO nums (id, a, b, s) VALUES (204, 4, 0, 'd')",
    ]
    _run_when_case(spark, tmp_path, "selftab", trigs, stmts)


def test_subquery_raise_condition_live(spark, tmp_path):
    """RAISE(...) WHERE (SELECT ...) evaluates against live state: the
    IGNORE fires only once the body-maintained audit count crosses the
    threshold, skipping that row's insert (BEFORE) while earlier rows
    landed."""
    trigs = [
        "CREATE TRIGGER tw3 BEFORE INSERT ON nums FOR EACH ROW BEGIN "
        "INSERT INTO audit VALUES (NEW.id, 'r', NEW.a); "
        "SELECT RAISE(IGNORE) WHERE (SELECT COUNT(*) FROM audit) >= 3; "
        "END"
    ]
    stmts = [
        "INSERT INTO nums (id, a, b, s) VALUES "
        "(301, 1, 0, 'a'), (302, 2, 0, 'b'), (303, 3, 0, 'c'), (304, 4, 0, 'd')"
    ]
    _run_when_case(spark, tmp_path, "raise", trigs, stmts)


def test_subquery_when_on_update_and_delete(spark, tmp_path):
    """Subquery WHENs on UPDATE and DELETE triggers, interleaved with
    constant WHENs (the batched fast path must coexist with the live
    path in one firing set)."""
    trigs = [
        "CREATE TRIGGER tw4 AFTER UPDATE ON nums FOR EACH ROW "
        "WHEN (SELECT coalesce(MAX(x), 0) FROM audit) < 15 "
        "BEGIN INSERT INTO audit VALUES (OLD.id, 'u', coalesce(NEW.a, 0) * 10); END",
        "CREATE TRIGGER tw5 BEFORE DELETE ON nums FOR EACH ROW "
        "WHEN OLD.id > 1 "
        "BEGIN INSERT INTO audit VALUES (OLD.id, 'd', -1); END",
    ]
    stmts = [
        "UPDATE nums SET a = coalesce(a, 0) + 1 WHERE id <= 3",
        "DELETE FROM nums WHERE id IN (1, 2)",
    ]
    _run_when_case(spark, tmp_path, "updel", trigs, stmts)


# ---------------------------------------------------------------------------
# round-10: UPDATE ... FROM on TRIGGERED tables (previously a loud reject)
# — the triggers fire per matched target row with the deterministic
# greatest-tuple pick, batch path applies the exact pairs fired on.
# ---------------------------------------------------------------------------


def test_update_from_fires_triggers(spark, tmp_path):
    """UPDATE..FROM with state-blind UPDATE triggers: every matched target
    row fires OLD/NEW as a plain UPDATE would; unmatched rows are
    untouched and fire nothing."""
    trigs = [
        "CREATE TRIGGER uf1 AFTER UPDATE ON nums FOR EACH ROW "
        "BEGIN INSERT INTO audit VALUES (OLD.id, 'uf', "
        "coalesce(NEW.a, -1) * 100 + coalesce(OLD.a, -1)); END",
        "CREATE TRIGGER uf2 BEFORE UPDATE OF a ON nums FOR EACH ROW "
        "WHEN NEW.a > 5 "
        "BEGIN INSERT INTO audit VALUES (OLD.id, 'big', NEW.a); END",
    ]
    stmts = [
        # one FROM match per target row (multi-match is SQLite-unpredictable)
        "UPDATE nums SET a = f.v FROM "
        "(SELECT 1 AS fid, 7 AS v UNION ALL SELECT 3, 2) f "
        "WHERE nums.id = f.fid",
        "UPDATE nums SET b = b + f.v, s = f.tag FROM "
        "(SELECT 5 AS fid, 40 AS v, 'tagged' AS tag) f WHERE nums.id = f.fid",
    ]
    _run_when_case(spark, tmp_path, "updfrom", trigs, stmts)


def test_update_from_triggers_state_observing_interleave(spark, tmp_path):
    """UPDATE..FROM whose trigger body OBSERVES state (UPDATE on audit):
    multi-row statements must interleave per target row in rowid order —
    the same probed rule as plain UPDATE."""
    trigs = [
        "CREATE TRIGGER uf3 AFTER UPDATE ON nums FOR EACH ROW BEGIN "
        "INSERT INTO audit VALUES (OLD.id, 'n', "
        "(SELECT count(*) FROM audit)); END",
    ]
    stmts = [
        "UPDATE nums SET a = f.v FROM "
        "(SELECT 1 AS fid, 11 AS v UNION ALL SELECT 3, 13 "
        "UNION ALL SELECT 5, 15) f WHERE nums.id = f.fid",
    ]
    _run_when_case(spark, tmp_path, "updfrom_obs", trigs, stmts)


def test_update_from_with_subquery_when(spark, tmp_path):
    """The two round-10 features composed: UPDATE..FROM on a triggered
    table whose WHEN is a live-state subquery."""
    trigs = [
        "CREATE TRIGGER uf4 AFTER UPDATE ON nums FOR EACH ROW "
        "WHEN (SELECT count(*) FROM audit) < 2 "
        "BEGIN INSERT INTO audit VALUES (OLD.id, 'w', NEW.a); END",
    ]
    stmts = [
        "UPDATE nums SET a = f.v FROM "
        "(SELECT 1 AS fid, 21 AS v UNION ALL SELECT 2, 22 "
        "UNION ALL SELECT 3, 23 UNION ALL SELECT 5, 25) f "
        "WHERE nums.id = f.fid",
    ]
    _run_when_case(spark, tmp_path, "updfrom_when", trigs, stmts)


def test_update_from_changing_pk_with_triggers(spark, tmp_path):
    """UPDATE..FROM that moves the PRIMARY KEY itself: the pairs-apply
    join-back must key on the OLD pk."""
    trigs = [
        "CREATE TRIGGER uf5 AFTER UPDATE ON nums FOR EACH ROW "
        "BEGIN INSERT INTO audit VALUES (OLD.id, 'mv', NEW.id); END",
    ]
    stmts = [
        "UPDATE nums SET id = f.nid FROM "
        "(SELECT 2 AS fid, 92 AS nid) f WHERE nums.id = f.fid",
    ]
    _run_when_case(spark, tmp_path, "updfrom_pk", trigs, stmts)


# ---------------------------------------------------------------------------
# round-10 campaign: triggers x UNIQUE constraints x conflict forms
#
# Round 10 closed the triggers-x-extended-uniqueness INSERT reject: the
# per-row trigger conflict loop now tracks EVERY declared constraint
# (collation-folded) like the untriggered sequential path.  This campaign
# crosses the unique-constraints grammar with INSERT triggers and the
# supported conflict forms, vs live SQLite.  Generator constraints mirror
# the documented loud rejects: DO NOTHING/DO UPDATE targets stay on the
# pk, no OR-IGNORE+ON-CONFLICT combos, trigger bodies never write t,
# triggered UPDATE on unique tables excluded (still rejected), DELETE
# included (allowed since round 10 — keys never move).
# ---------------------------------------------------------------------------

N_TRIG_UNIQUE_CASES = _n("TROUGH_FUZZ_TRIG_UNIQUE", 8, 2)


def _trig_unique_ddl(rng: random.Random) -> str:
    ucoll = rng.choice(["", " COLLATE NOCASE", " COLLATE RTRIM"])
    tail = ", UNIQUE (a, b)" if rng.random() < 0.4 else ""
    ddl = (
        f"CREATE TABLE t (id INTEGER PRIMARY KEY, u TEXT UNIQUE{ucoll}, "
        f"a INTEGER, b TEXT{tail});\n"
        "CREATE TABLE log (tag TEXT, x INTEGER)"
    )
    trigs = []
    for i in range(rng.randint(1, 2)):
        timing = rng.choice(["BEFORE", "AFTER"])
        when = ""
        if rng.random() < 0.4:
            when = rng.choice(
                [
                    "WHEN NEW.id > 1 ",
                    "WHEN coalesce(NEW.a, 0) >= 1 ",
                    "WHEN (SELECT COUNT(*) FROM log) < 6 ",
                ]
            )
        body = rng.choice(
            [
                f"INSERT INTO log VALUES ('t{i}', NEW.id);",
                f"INSERT INTO log VALUES ('t{i}', coalesce(NEW.a, -1));",
                f"INSERT INTO log VALUES ('t{i}', (SELECT COUNT(*) FROM log));",
            ]
        )
        trigs.append(
            f"CREATE TRIGGER tq{i} {timing} INSERT ON t "
            f"FOR EACH ROW {when}BEGIN {body} END"
        )
    if rng.random() < 0.5:
        trigs.append(
            "CREATE TRIGGER tqd BEFORE DELETE ON t FOR EACH ROW "
            "BEGIN INSERT INTO log VALUES ('d', OLD.id); END"
        )
    return ddl, trigs


def _trig_unique_script(rng: random.Random) -> list[str]:
    stmts = []
    n = 1
    for _ in range(rng.randint(4, 7)):
        kind = rng.randrange(7)
        u = rng.choice(_UVALS)
        a = rng.choice(["NULL", str(rng.randint(0, 2))])
        b = rng.choice(["NULL", "'p'", "'q'"])
        vals = f"({n}, {u}, {a}, {b})"
        n += 1
        if kind in (0, 1):
            stmts.append(f"INSERT INTO t VALUES {vals}")
        elif kind == 2:
            v2 = f"({n}, {rng.choice(_UVALS)}, {a}, {b})"
            n += 1
            stmts.append(f"INSERT OR IGNORE INTO t VALUES {vals}, {v2}")
        elif kind == 3:
            v2 = f"({n}, {rng.choice(_UVALS)}, {a}, {b})"
            n += 1
            stmts.append(f"INSERT OR REPLACE INTO t VALUES {vals}, {v2}")
        elif kind == 4:
            tgt = rng.choice(["", "(id)"])
            stmts.append(f"INSERT INTO t VALUES {vals} ON CONFLICT{tgt} DO NOTHING")
        elif kind == 5:
            stmts.append(
                f"INSERT INTO t VALUES {vals} ON CONFLICT(id) "
                f"DO UPDATE SET b = coalesce(excluded.b, t.b), "
                f"a = coalesce(t.a, 0) + 1"
            )
        else:
            stmts.append(f"DELETE FROM t WHERE a = {rng.randint(0, 2)}")
    return stmts


@pytest.mark.parametrize("case", range(N_TRIG_UNIQUE_CASES))
def test_fuzzed_triggered_unique_matches_sqlite(spark, tmp_path, case):
    rng = random.Random(SEED + 3000 + case)
    ddl, trigs = _trig_unique_ddl(rng)
    stmts = _trig_unique_script(rng)

    conn = sqlite3.connect(":memory:")
    conn.isolation_level = None
    conn.executescript(ddl + ";")
    for t in trigs:
        conn.execute(t)
    store = SegmentStore(spark, str(tmp_path / "store"))
    store.set_schema("tq10", ddl + ";")
    store.provision(f"tqseg{case}", "tq10")
    store.write(f"tqseg{case}", ";\n".join(trigs))

    sq_raised, en_raised = _run_script_both(conn, store, f"tqseg{case}", stmts)
    assert sq_raised == en_raised, (
        f"\nddl: {ddl}\ntrigs: {trigs}\nscript: {stmts}\n"
        f"sqlite raised: {sq_raised}, engine raised: {en_raised}"
    )
    for q in (
        "SELECT id, u, a, b FROM t ORDER BY id",
        "SELECT tag, x FROM log ORDER BY tag, x",
    ):
        expected = [tuple(row) for row in conn.execute(q).fetchall()]
        got = [tuple(r.values()) for r in store.read(f"tqseg{case}", q)]
        assert got == expected, (
            f"\nddl: {ddl}\ntrigs: {trigs}\nscript: {stmts}\nq: {q}\n"
            f"sqlite: {expected}\nengine: {got}"
        )
