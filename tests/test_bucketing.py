"""Bucketed co-located joins: same-bucketed tables must join with NO
Exchange on either side, and results must equal the shuffled join."""

from __future__ import annotations

import pytest

from trough_spark.bucketing import bucketed_join, plan_has_shuffle, write_bucketed
from trough_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("buckets")
    l = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(l, "b_lineitem", "l_orderkey", 8, str(tmp / "l"))
    write_bucketed(o, "b_orders", "l_orderkey", 8, str(tmp / "o"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the contrast is shuffled-SMJ vs bucketed-SMJ (at
    # real scale neither side broadcasts — that's the case bucketing serves)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not plan_has_shuffle(joined), "bucketed join must not shuffle:\n" + plan
        assert "SortMergeJoin" in plan and "Bucketed: true" in plan
        # and the shuffle-free join is still correct
        expected = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
                "l_orderkey",
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(bucketed):
    spark = bucketed
    l = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    # force non-broadcast so the contrast is shuffle-vs-bucketed, then check
    import pyspark.sql.functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = l.join(o, "l_orderkey")
        assert plan_has_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_b5_join_multiway_broadcasts_only_true_dims(spark):
    """The fact-scale customer table must NOT carry a broadcast hint: with
    auto-broadcast disabled, the only BroadcastHashJoins left are the hinted
    dim joins (region into nation, the 25-row dim chain into customer), and
    lineitem ⋈ orders ⋈ customer runs as shuffle sort-merge joins."""
    from trough_spark.queries.relational import b5_join_multiway

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = b5_join_multiway(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") <= 2, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
