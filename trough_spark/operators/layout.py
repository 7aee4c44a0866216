"""Data-layout operators: Z-order (Morton) clustering keys.

Why this exists at 100 TB: parquet min/max zone maps prune on ONE sort
dimension; queries filtering two+ dimensions (custkey AND price band,
host AND capture time) get no pruning on the second.  Interleaving the
dimensions' bits into a single Morton key and range-partitioning + sorting
by it gives every dimension partial locality, so both filters prune files.
This is the same layout trick Delta/Iceberg expose as OPTIMIZE ZORDER BY;
here it is a plain column expression + repartitionByRange, nothing engine-
specific.

All pure JVM bit arithmetic — no UDF, no shuffle beyond the one explicit
range repartition the caller asks for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints: interleave the low ``bits`` bits
    (x in even positions, y in odd).  Unrolled to 2*bits constant-folded
    JVM expressions — stays inside whole-stage codegen."""
    xb = x.cast("bigint")
    yb = y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton code as portable SQL (DuckDB oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_repartition(
    df: DataFrame, x_col: str, y_col: str, num_partitions: int, bits: int = 16
) -> DataFrame:
    """Range-partition + sort by the Morton key — the write-side layout step.
    Files written from this frame carry tight min/max zone maps on BOTH
    dimensions, so reads filtering either one prune at the file level."""
    keyed = df.withColumn("_z", zvalue(F.col(x_col), F.col(y_col), bits))
    return (
        keyed.repartitionByRange(num_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
