"""Bucketed (pre-partitioned) tables for co-located joins.

At 100 TB the dominant cost of a repeated big⋈big join (lineitem⋈orders on
orderkey, events⋈users on user_id) is the shuffle.  Hive bucketing pays that
shuffle ONCE at write time: both tables are written ``bucketBy(n, key)``
``sortBy(key)``, after which every equi-join on the key compiles to a
sort-merge join with NO Exchange on either side — verified by
``assert_no_shuffle_join`` in the tests.

Bucket-count guidance: pick n so (table size / n) ≈ 128-512 MB per bucket at
the target scale, and use the SAME n for tables that join together (Spark
can only elide both shuffles when bucket counts match, or one is a multiple
of the other with bucket coalescing enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed catalog table at ``path``."""
    writer = df.write.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.option("path", path).mode("overwrite").format("parquet").saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Equi-join two same-bucketed catalog tables — shuffle-free by layout."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan repartitions data (shuffle exchange).
    A BroadcastExchange is NOT a shuffle — it replicates a small side."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan
