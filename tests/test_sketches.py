"""Sketch operator guarantees: HLL error bound + mergeability, CMS
upper-bound property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trough_spark.operators import sketches as SK


def test_hll_estimate_within_bound(spark):
    # 2000 distinct values; m=256 registers → relative error ~1.04/sqrt(m) ≈ 6.5%
    df = spark.range(2000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    est = SK.hll_estimate(df, "k", p=8).collect()[0]["est_distinct"]
    assert abs(est - 2000) / 2000 < 0.25, est


def test_hll_duplicates_do_not_inflate(spark):
    base = spark.range(500).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    dup = base.unionAll(base).unionAll(base)
    e1 = SK.hll_estimate(base, "k").collect()[0]["est_distinct"]
    e3 = SK.hll_estimate(dup, "k").collect()[0]["est_distinct"]
    assert e1 == e3


def test_hll_registers_merge_by_max(spark):
    """Partial register vectors from two halves merge by max() into exactly
    the whole-input registers — the property that makes HLL shuffle-free."""
    df = spark.range(1000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") % 2).alias("half"),
    )
    whole = {
        r["bucket"]: r["r"] for r in SK.hll_registers(df, "k").collect()
    }
    parts = SK.hll_registers(df, "k", group_by="half")
    merged = {
        r["bucket"]: r["mx"]
        for r in parts.groupBy("bucket").agg(F.max("r").alias("mx")).collect()
    }
    assert merged == whole


def test_hll_grouped_matches_per_group(spark):
    df = spark.range(600).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        F.when(F.col("id") < 400, "a").otherwise("b").alias("g"),
    )
    grouped = {
        r["g"]: r["est_distinct"]
        for r in SK.hll_estimate(df, "k", group_by="g").collect()
    }
    for g, n in (("a", 400), ("b", 200)):
        solo = SK.hll_estimate(df.filter(F.col("g") == g), "k").collect()[0][
            "est_distinct"
        ]
        assert grouped[g] == solo, (g, grouped[g], solo)
        assert abs(grouped[g] - n) / n < 0.35, (g, grouped[g])


def test_cms_upper_bound_and_accuracy(spark):
    # skewed counts: key_i occurs (i % 37) + 1 times
    df = spark.range(3000).select(
        F.concat(F.lit("u"), (F.col("id") % 200)).alias("k")
    )
    truth = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sketch = SK.cms_build(df, "k")
    est = {
        r["k"]: r["est_count"]
        for r in SK.cms_lookup(sketch, df.select("k").distinct(), "k").collect()
    }
    assert set(est) == set(truth)
    for k, n in truth.items():
        assert est[k] >= n, (k, est[k], n)  # CMS never underestimates
    # with 200 keys in 3x256 buckets, most estimates should be exact
    exact = sum(1 for k in truth if est[k] == truth[k])
    assert exact >= 150, exact


def test_cms_weighted_counts(spark):
    df = spark.range(100).select(
        F.concat(F.lit("w"), (F.col("id") % 10)).alias("k"),
        F.lit(5).cast("bigint").alias("wt"),
    )
    sketch = SK.cms_build(df, "k", weight=F.col("wt"))
    est = {
        r["k"]: r["est_count"]
        for r in SK.cms_lookup(sketch, df.select("k").distinct(), "k").collect()
    }
    for k, v in est.items():
        assert v >= 50, (k, v)


def test_cms_sketch_size_is_constant(spark):
    df = spark.range(5000).select(F.concat(F.lit("s"), F.col("id")).alias("k"))
    sketch = SK.cms_build(df, "k", depth=3, width=64)
    assert sketch.count() <= 3 * 64


def test_kmv_sample_is_mergeable_and_deterministic(spark):
    # bottom-k of the union == bottom-k of the two halves' bottom-k's —
    # the property that makes KMV a sketch (per-partition combine is merge)
    import pyspark.sql.functions as F

    from trough_spark.operators.sketches import kmv_sample

    df = spark.range(0, 2000).select(F.col("id"), (F.col("id") * 3).alias("v"))
    k = 64
    whole = {r.kmv_h for r in kmv_sample(df, F.col("id"), k=k).collect()}
    lo = kmv_sample(df.filter("id < 1000"), F.col("id"), k=k)
    hi = kmv_sample(df.filter("id >= 1000"), F.col("id"), k=k)
    merged = {
        r.kmv_h
        for r in lo.unionByName(hi).orderBy("kmv_h").limit(k).collect()
    }
    assert whole == merged and len(whole) == k
    # deterministic across runs
    again = {r.kmv_h for r in kmv_sample(df, F.col("id"), k=k).collect()}
    assert whole == again


def test_kmv_quantiles_monotone_and_bounded(spark):
    import pyspark.sql.functions as F

    from trough_spark.operators.sketches import kmv_quantiles

    df = spark.range(0, 5000).select(F.col("id"), (F.col("id") % 997).cast("double").alias("v"))
    rows = sorted(
        kmv_quantiles(df, F.col("id"), "v", k=128, n_buckets=10).collect(),
        key=lambda r: r.q,
    )
    assert [r.q for r in rows] == list(range(11))
    bounds = [r.boundary for r in rows]
    assert bounds == sorted(bounds)  # monotone deciles
    assert all(0 <= b <= 996 for b in bounds)
    # the KMV distinct estimate should land within 35% of the truth (5000
    # distinct keys, k=128 -> stderr ~ 1/sqrt(k-2) ~ 9%)
    est = rows[0].est_ndv
    assert 0.65 * 5000 <= est <= 1.35 * 5000


def test_kmv_plan_is_partial_topk(spark):
    import pyspark.sql.functions as F

    from trough_spark.operators.sketches import kmv_sample

    df = spark.range(0, 10000).select(F.col("id"), F.col("id").alias("v"))
    plan = (
        kmv_sample(df, F.col("id"), k=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # per-partition top-k merge, not a global sort: the sketch shape
    assert "TakeOrderedAndProject" in plan, plan


def test_source_overlap_estimate_tracks_true_jaccard(spark):
    import pyspark.sql.functions as F

    from trough_spark.operators.sketches import (
        source_minhash_signature,
        source_overlap_estimate,
    )

    # A = 0..1499, B = 1000..2499 -> |A∩B| = 500, |A∪B| = 2500, J = 0.2
    # C = 0..1499 (identical to A) -> J(A,C) = 1.0
    rows = (
        [("A", i) for i in range(1500)]
        + [("B", i) for i in range(1000, 2500)]
        + [("C", i) for i in range(1500)]
    )
    df = spark.createDataFrame(rows, "src string, k long")
    sig = source_minhash_signature(df, "src", F.col("k"), n_buckets=64)
    got = {
        (r.grp_a, r.grp_b): r
        for r in source_overlap_estimate(sig, n_buckets=64).collect()
    }
    assert got[("A", "C")].est_jaccard == 1.0
    ab = got[("A", "B")]
    assert ab.n_common_buckets == 64
    # stderr ~ sqrt(J(1-J)/64) ~ 0.05; allow 3 sigma
    assert abs(ab.est_jaccard - 0.2) < 0.15
    assert abs(got[("B", "C")].est_jaccard - 0.2) < 0.15


def test_kmv_est_ndv_exact_when_sample_exhaustive(spark):
    """n < k: the KMV sample IS the key set, so est_ndv must be the exact
    distinct count, not the (k-1)/(hk/2^60) extrapolation (ADVICE r4)."""
    from trough_spark.operators.sketches import kmv_quantiles

    df = spark.range(100).select(F.col("id"), (F.col("id") * 2.5).alias("v"))
    out = kmv_quantiles(df, F.col("id"), "v", k=256, n_buckets=4).collect()
    assert out and all(r["est_ndv"] == 100.0 for r in out)
