"""GROUPS-frame composition (operators/windows.py) vs DuckDB's native
RANGE-over-dense_rank formulation, including EXCLUDE clauses, NULL values,
and unbounded sides."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from trough_spark.operators import windows as GW


@pytest.fixture(scope="module")
def data():
    # ties within (p, k) peer groups + a NULL value row
    return pd.DataFrame(
        {
            "p": ["a"] * 6 + ["b"] * 4,
            "k": [1, 1, 2, 3, 3, 3, 1, 2, 2, 5],
            "v": [10.0, 20.0, 5.0, 1.0, None, 2.0, 100.0, 7.0, 7.0, 3.0],
            "rid": list(range(10)),
        }
    )


def _duck(data, frame, exclude):
    con = duckdb.connect()
    con.register("t0", data)
    ex = "" if exclude == GW.NO_OTHERS else f" EXCLUDE {exclude.upper()}"
    rows = con.execute(
        f"""
        WITH t AS (SELECT *, DENSE_RANK() OVER (PARTITION BY p ORDER BY k) AS g FROM t0)
        SELECT rid,
               SUM(v)   OVER (PARTITION BY p ORDER BY g {frame}{ex}) AS s,
               COUNT(v) OVER (PARTITION BY p ORDER BY g {frame}{ex}) AS c
        FROM t ORDER BY rid
        """
    ).fetchall()
    return {r[0]: (r[1], r[2]) for r in rows}


CASES = [
    (1, 1, GW.NO_OTHERS, "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING"),
    (1, 1, GW.CURRENT_ROW, "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING"),
    (1, 1, GW.GROUP, "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING"),
    (1, 1, GW.TIES, "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING"),
    (None, 0, GW.TIES, "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"),
    (0, None, GW.GROUP, "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"),
]


@pytest.mark.parametrize("prec,foll,exclude,frame", CASES)
def test_groups_frame_matches_duckdb(spark, data, prec, foll, exclude, frame):
    df = spark.createDataFrame(data)
    out = GW.groups_frame(
        df, "p", "k", "v", prec, foll, exclude=exclude, out_sum="s", out_count="c"
    )
    got = {r["rid"]: (r["s"], r["c"]) for r in out.collect()}
    want = _duck(data, frame, exclude)
    assert set(got) == set(want)
    for rid in want:
        ws, wc = want[rid]
        gs, gc = got[rid]
        assert gc == wc, (rid, exclude, gc, wc)
        if ws is None:
            assert gs is None, (rid, exclude, gs)
        else:
            assert gs == pytest.approx(ws), (rid, exclude, gs, ws)


def test_groups_frame_rejects_unknown_exclude(spark, data):
    df = spark.createDataFrame(data)
    with pytest.raises(ValueError):
        GW.groups_frame(df, "p", "k", "v", 1, 1, exclude="bogus")
