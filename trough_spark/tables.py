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
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (which Spark
        # only reads with nanosAsLong=true, yielding a BIGINT of raw nanos)
        # and plain timestamp[us].  Branch on the schema that actually loads
        # so either testdata vintage works:
        #   LongType      -> truncate nanos to micros with exact integer
        #                    division (double division loses precision >2^53)
        #   timestamp_ntz -> cast to session-TZ timestamp for a stable type
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        import pyspark.sql.functions as F
        from pyspark.sql.types import LongType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count of a table from its parquet footer, or None.

    Driver-side metadata read (microseconds) — satisfies operator scope
    guards (e.g. ``cosine_pairs``'s ``max_rows``) without running a Spark
    count job per query build (optimization round 11, guide §6 metadata;
    re-applied from round 10 in isolation after the bundled changes that
    regressed were reverted).  Only valid for the UNFILTERED table;
    callers applying filters must still count.
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries see the
    same catalog names the DuckDB oracle uses."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
