"""Adversarial-skew demo at registry scale (VERDICT r4 item 8): plant a
degenerate band value across 10% of a corpus and MEASURE that the capped LSH
path bounds the emitted candidate pairs while lossless mode is quadratic in
the hot bucket — turning the 100 TB hot-bucket claim into a CI artifact.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators.dedup import minhash_lsh_candidates, minhash_signatures
from trough_spark.tables import load_table


def test_hot_bucket_cap_bounds_adversarial_pairs(spark):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    n = docs.count()
    n_hot = n // 10
    # degenerate content: 10% of docs share byte-identical text, so ALL their
    # minhash bands collide in every bucket — the adversarial hot key
    poisoned = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") < n_hot,
            F.lit("the same degenerate boilerplate page " * 8),
        ).otherwise(F.col("text")),
    )
    sigs = minhash_signatures(poisoned, "doc_id", "text").cache()
    try:
        lossless = minhash_lsh_candidates(sigs).count()
        cap = 8
        capped_df = minhash_lsh_candidates(sigs, max_bucket_size=cap)
        capped = capped_df.count()
        # lossless emits the full quadratic hot cluster: >= C(n_hot, 2)
        hot_quadratic = n_hot * (n_hot - 1) // 2
        assert lossless >= hot_quadratic, (lossless, hot_quadratic)
        # capped path: the hot bucket (occupancy n_hot >> cap) is dropped
        # entirely, so emitted pairs collapse to the corpus's ordinary
        # collisions — bounded work however degenerate the corpus is
        assert capped * 10 < lossless, (capped, lossless)
        assert capped < hot_quadratic / 10, (capped, hot_quadratic)
        # no capped pair touches the hot cluster on both sides
        hot_pairs = capped_df.filter(
            (F.col("id1") < n_hot) & (F.col("id2") < n_hot)
        ).count()
        assert hot_pairs == 0
    finally:
        sigs.unpersist()
