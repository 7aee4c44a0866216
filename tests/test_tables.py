"""Schema pin for every TESTDATA table at every scale factor.

Round 2's bench crash came from ``load_table`` assuming the on-disk parquet
type of ``events.ts`` (nanos-as-long vs timestamp[us]).  This test turns that
class of environment drift into a 2-second unit failure instead of a crashed
bench: it loads every table at every available sf dir and asserts the dtypes
downstream operators rely on.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from trough_spark.tables import TABLE_NAMES, load_table

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

# column -> required Spark type, per table.  Only pins the columns operators
# depend on; extra columns are allowed.
PINNED = {
    "events": {"ts": T.TimestampType(), "event_id": T.LongType(), "user_id": T.LongType()},
    "lineitem": {"l_orderkey": T.LongType(), "l_quantity": (T.DoubleType(), T.DecimalType)},
    "orders": {"o_orderkey": T.LongType()},
    "customer": {"c_custkey": T.LongType()},
    "documents": {"doc_id": T.LongType(), "text": T.StringType()},
    "embeddings": {"vec_id": T.LongType(), "embedding": T.ArrayType},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_loads_with_pinned_schema(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    schema = {f.name: f.dataType for f in df.schema.fields}
    for col, want in PINNED.get(name, {}).items():
        assert col in schema, f"{name}.{col} missing at {sf_dir}"
        got = schema[col]
        wants = want if isinstance(want, tuple) else (want,)
        ok = any(
            (isinstance(w, type) and isinstance(got, w)) or got == w for w in wants
        )
        assert ok, f"{name}.{col} is {got}, want {want}"
    # every table must actually produce rows
    assert df.limit(1).count() == 1, f"{name} empty at {sf_dir}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_real_timestamp(spark, sf_dir):
    """ts must be a usable session-TZ timestamp: window() over it must work."""
    import pyspark.sql.functions as F

    df = load_table(spark, sf_dir, "events")
    out = (
        df.groupBy(F.window("ts", "1 hour")).count().limit(1).collect()
    )
    assert len(out) == 1
