"""Parquet table loaders for the driver-provided synthetic datasets.

TESTDATA.md tables: region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under a scale-factor
directory.  Loaders are plain ``spark.read.parquet`` scans so Catalyst gets
filter pushdown + column pruning for free; nothing is cached implicitly
(bench queries must show their true scan cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects; read it
        # as raw nanos and truncate to microseconds with exact integer
        # division (a double division would lose precision above 2^53 ns).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        import pyspark.sql.functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries see the
    same catalog names the DuckDB oracle uses."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
