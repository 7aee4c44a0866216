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


# ---------------------------------------------------------------------------
# Adaptive scan-parallelism fix (optimization round 10, guide §2.5).
#
# Parquet scans parallelize across row groups, never within one: a table
# shipped as a single file with one row group (exactly the driver testdata
# layout) pins the whole scan STAGE — decode plus every map-side expression
# (shingle md5s, token explodes, vote sums) and the partial aggregation — to
# ONE core.  That is the guide's "one huge unsplittable file" input-skew
# case; the fix is a repartition immediately after the read.
#
# Two things keep this from being a local[32] hack:
#   * it fires only when the footer-derived row-group count cannot occupy
#     the session's cores and the table is small enough that one shuffle of
#     it is trivially cheap — at production scale (thousands of row groups)
#     the loader stays a bare scan;
#   * the caller names the first downstream clustering key, so the
#     repartition is a HASH exchange that SATISFIES the downstream
#     groupBy/window distribution — it replaces that exchange instead of
#     adding one (measured: a blanket round-robin repartition here LOSES,
#     the keyed form wins 1.3-2x on the map-heavy document operators).
#
# SPARK_GRAFT_SCAN_REPARTITION=off disables; an integer forces the count.
# ---------------------------------------------------------------------------

_CLUSTER_MAX_BYTES = 2 * 1024**3


def _single_file_row_groups(path: str) -> int | None:
    """Row-group count of a local parquet file, or None when unreadable."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if st.st_size >= _CLUSTER_MAX_BYTES:
        return None
    key = ("rg", path, st.st_mtime_ns, st.st_size)
    if key not in _DF_CACHE:
        try:
            import pyarrow.parquet as pq

            _DF_CACHE[key] = pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            _DF_CACHE[key] = None
    return _DF_CACHE[key]


def load_table_clustered(
    spark: SparkSession, sf_dir: str, name: str, *keys: str
) -> DataFrame:
    """``load_table`` plus the adaptive keyed repartition described above.

    ``keys`` must be (a prefix-subset of) the first downstream clustering —
    the groupBy or window partition key — so the exchange merges with it.
    """
    df = load_table(spark, sf_dir, name)
    mode = os.environ.get("SPARK_GRAFT_SCAN_REPARTITION", "auto")
    if mode == "off" or not keys:
        return df
    cores = spark.sparkContext.defaultParallelism
    n = int(mode) if mode != "auto" else cores
    if mode == "auto":
        rg = _single_file_row_groups(f"{sf_dir}/{name}.parquet")
        if rg is None or rg >= cores:
            return df
    fp = _load_fingerprint(spark, f"{sf_dir}/{name}.parquet") or (spark, sf_dir, name)
    ck = ("clustered", fp, keys, n)
    if ck not in _DF_CACHE:
        _DF_CACHE[ck] = df.repartition(n, *keys)
    return _DF_CACHE[ck]


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count of a table from its parquet footer, or None.

    Driver-side metadata read (microseconds) — used to satisfy operator
    scope guards (e.g. ``cosine_pairs``'s ``max_rows``) without running a
    Spark count job per query build.  Only valid for the UNFILTERED table;
    callers applying filters must still count.
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
    except OSError:
        return None
    key = ("nrows", path, st.st_mtime_ns, st.st_size)
    if key not in _DF_CACHE:
        try:
            import pyarrow.parquet as pq

            _DF_CACHE[key] = pq.ParquetFile(path).metadata.num_rows
        except Exception:
            _DF_CACHE[key] = None
    return _DF_CACHE[key]


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries see the
    same catalog names the DuckDB oracle uses."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
