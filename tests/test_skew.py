"""Skew handling: AQE skew-join splitting engages on a hot key, and the
salted two-phase aggregate stays correct under maximal skew
(operators/skew.py; session.py turns skewJoin on by default)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from trough_spark.operators.skew import salted_agg

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.shuffle.partitions": "16",
}


def test_aqe_splits_skewed_join(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # 90% of rows share key 0 — one reducer would take ~10x the median
        left = spark.range(400000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id") % 97).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(97).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        joined = left.join(right, "k")
        rows = joined.collect()
        assert len(rows) == 400000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed join:\n" + plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_salted_agg_correct_under_skew(spark):
    df = spark.range(100000).select(
        F.when(F.col("id") % 20 != 0, "hot").otherwise("cold").alias("k"),
        F.col("id").alias("x"),
    )
    got = {
        r["k"]: (r["n"], r["tot"])
        for r in salted_agg(
            df, ["k"], {"n": (F.count(F.lit(1)), F.sum), "tot": (F.sum("x"), F.sum)}, 16
        ).collect()
    }
    exp = {
        r["k"]: (r["n"], r["tot"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("tot"))
        .collect()
    }
    assert got == exp


def test_salted_join_matches_plain_and_spreads_key(spark):
    from trough_spark.operators.skew import salted_join

    big = spark.range(20000).select(
        (F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50)).alias("k"),
        F.col("id").alias("payload"),
    )  # 90% of rows share k=1
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], "k long, name string"
    )
    plain = big.join(small, "k").groupBy("k").count()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(big, small, "k", n_salts=8)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan  # join key actually includes the salt
        got = {(r.k, r["count"]) for r in salted.groupBy("k").count().collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == {(r.k, r["count"]) for r in plain.collect()}


def test_salted_join_left_keeps_unmatched_once(spark):
    from trough_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a"), (2, "b"), (9, "c")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, w string")
    rows = sorted(
        (r.k, r.v, r.w) for r in salted_join(big, small, "k", 4, how="left").collect()
    )
    assert rows == [(1, "a", "x"), (2, "b", None), (9, "c", None)]


def test_chunk_rewrite_survives_pathological_hot_chunk(spark):
    # Adversarial skew: 600 identical single-chunk docs -> ONE chunk hash
    # carries every row. The winner aggregate partial-aggregates map-side
    # and only doc 0 survives with its chunk.
    from trough_spark.operators.dedup import chunk_dedup_rewrite

    docs = spark.createDataFrame(
        [(i, "the same boilerplate line repeated everywhere") for i in range(600)],
        "doc_id long, text string",
    )
    rows = chunk_dedup_rewrite(docs, "doc_id", "text", chunk=20).collect()
    assert len(rows) == 1
    assert rows[0].id == 0 and rows[0].kept_chunks == 1
