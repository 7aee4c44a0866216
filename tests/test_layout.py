"""Z-order layout tests (operators/layout.py): Morton key correctness and
the actual pruning payoff the layout exists for."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from trough_spark.operators import layout as L


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_bit_interleave(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(pts, "x int, y int")
    rows = df.select("x", "y", L.zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    for r in rows:
        assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_zvalue_sql_matches_column_expr(spark):
    df = spark.createDataFrame([(i * 7 % 64, i * 13 % 64) for i in range(64)], "x int, y int")
    got = df.select(
        L.zvalue(F.col("x"), F.col("y")).alias("a"),
        F.expr(L.zvalue_sql("x", "y")).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in got)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Write a grid z-ordered vs x-sorted; a filter on the SECOND dimension
    must touch fewer row groups (file min/max spans) under z-order."""
    n = 64
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )
    z_dir, s_dir = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    L.zorder_repartition(grid, "x", "y", num_partitions=16, bits=6).write.parquet(z_dir)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(s_dir)

    def files_containing(d, col, lo, hi):
        """Count parquet files whose [min,max] span intersects [lo,hi]."""
        import pyarrow.parquet as pq

        hit = 0
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            if fmin is not None and not (fmax < lo or fmin > hi):
                hit += 1
        return hit

    z_hit = files_containing(z_dir, "y", 0, 7)
    s_hit = files_containing(s_dir, "y", 0, 7)
    assert z_hit < s_hit, f"z-order should prune y-filters: z={z_hit} files vs xsort={s_hit}"
    # and the data itself is intact
    assert spark.read.parquet(z_dir).count() == n * n


def test_zorder_repartition_preserves_rows(spark):
    df = spark.createDataFrame([(i, i * 3 % 100, f"r{i}") for i in range(500)], "a int, b int, s string")
    out = L.zorder_repartition(df, "a", "b", num_partitions=8)
    assert out.columns == ["a", "b", "s"]
    assert out.count() == 500
    assert set(r["s"] for r in out.collect()) == {f"r{i}" for i in range(500)}
