"""Parquet table loaders for the driver-provided synthetic datasets.

TESTDATA.md tables: region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under a scale-factor
directory.  Loaders are plain ``spark.read.parquet`` scans so Catalyst gets
filter pushdown + column pruning for free; nothing is cached implicitly
(bench queries must show their true scan cost).
"""

from __future__ import annotations

import os

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

# Loaded-DataFrame cache (optimization round 10).  ``spark.read.parquet``
# re-reads the file footer for schema on EVERY call (~70-175 ms of driver I/O
# + py4j per table here), and a single query calls load_table up to five
# times — so table loading alone cost 0.1-0.5 s per query.  A DataFrame is an
# unexecuted plan, not a result: caching it is metadata reuse (the same move
# as the store's r8 view-registration cache), and every action still scans
# the parquet input.  The key fingerprints the file (mtime_ns, size) so a
# rewritten input invalidates, and includes the session so a new
# SparkSession never sees another session's plan.  Non-stat-able paths
# (remote URIs) are never cached.
_DF_CACHE: dict[tuple, DataFrame] = {}


def _load_fingerprint(spark: SparkSession, path: str):
    try:
        st = os.stat(path)
    except OSError:
        return None
    # the session OBJECT is part of the key (not a py4j-derived id: that
    # round-trip would cost more than the cache saves); a stopped-and-
    # recreated session is a new object, so plans never leak across sessions
    return (spark, path, st.st_mtime_ns, st.st_size)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = _load_fingerprint(spark, f"{sf_dir}/{name}.parquet")
    if key is not None and key in _DF_CACHE:
        return _DF_CACHE[key]
    df = _load_table_uncached(spark, sf_dir, name)
    if key is not None:
        _DF_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries see the
    same catalog names the DuckDB oracle uses."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
