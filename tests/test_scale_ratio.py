"""Scale-ratio stress: blow the sf0.1 corpus up 4× and 16× (deterministic
word-remap per replica, so replicas are fully DISSIMILAR — this measures
pipeline scaling, not pair explosion) and measure the wide MinHash-LSH
text→pairs wall time.  The 100 TB claim in numbers: work should scale
~linearly in corpus size because candidate generation is an equi-join on
band hashes and the signature shuffle carries 8 longs per doc.

Heavy (runs ~1-2 min): gated behind TROUGH_SCALE_STRESS=1; the measured
ratios live in PERF.md.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest

from trough_spark.operators.dedup import (
    minhash_lsh_candidates_wide,
    minhash_signature_vector,
)
from trough_spark.tables import load_table

pytestmark = pytest.mark.skipif(
    os.environ.get("TROUGH_SCALE_STRESS") != "1",
    reason="set TROUGH_SCALE_STRESS=1 to run the scale-ratio stress",
)


def _blowup(docs, k: int):
    """k dissimilar replicas per doc: every token is md5-remapped with the
    replica index, so shingle sets across replicas are disjoint while the
    token-count distribution (the work profile) is preserved."""
    if k == 1:
        return docs.select("doc_id", "text")
    return (
        docs.select("doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep"))
        .select(
            (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.trim(F.lower("text")), r"\s+"),
                    lambda w: F.substring(F.md5(F.concat(w, F.col("rep").cast("string"))), 1, 8),
                ),
            ).alias("text"),
        )
    )


def test_wide_lsh_scales_linearly(spark):
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    docs.count()  # page cache
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()

    def run(k: int) -> tuple[float, int]:
        d = _blowup(docs, k)
        sig = minhash_signature_vector(d, "doc_id", "text", num_perm=8, n=3)
        pairs = minhash_lsh_candidates_wide(sig, num_perm=8, rows_per_band=2)
        t0 = time.perf_counter()
        n = pairs.count()
        return time.perf_counter() - t0, n

    run(1)  # codegen warm-up for the plan shape
    t1, n1 = run(1)
    t4, n4 = run(4)
    t16, n16 = run(16)
    print(f"\nscale-ratio: 1x {t1:.2f}s/{n1} pairs, 4x {t4:.2f}s/{n4}, 16x {t16:.2f}s/{n16}")
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    # replicas are dissimilar: pair count must NOT explode quadratically
    assert n16 <= 20 * max(n1, 1) + 1000
    # generous linearity bound: 16x data in <= 16 * 2.5x the time (fixed
    # overhead makes small-k ratios look BETTER than linear, so this only
    # trips on genuinely super-linear behavior)
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def _blowup_vectors(vecs, k: int):
    """k decorrelated replicas per vector: each replica multiplies every
    component by a deterministic ±1 pattern keyed on (component, replica).
    Sign-flips are an orthogonal transform, so each replica internally
    preserves the corpus's cosine/pair structure while cross-replica
    cosines (and SRP codes) are decorrelated — pipeline scaling again, not
    pair explosion."""
    if k == 1:
        return vecs.select("vec_id", "embedding")
    return (
        vecs.select(
            "vec_id", "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep"),
        )
        .select(
            (F.col("vec_id") * k + F.col("rep")).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                * F.when(F.pmod(F.hash(i, F.col("rep")), 2) == 0, F.lit(1.0)).otherwise(
                    F.lit(-1.0)
                ),
            ).alias("embedding"),
        )
    )


def test_srp_multiprobe_scales_linearly(spark):
    """Third measured family: SRP multiprobe ANN pairs over 1x/4x/16x
    decorrelated corpora, with n_bits grown as log2(corpus) — the
    documented SRP scale lever (PERF.md): constant bucket load means
    candidate volume (N * probes * load) and thus wall time track corpus
    size.  Holding n_bits fixed would instead grow candidates as N^2/2^b —
    the anti-pattern this test exists to rule out of the shipped shape."""
    from trough_spark.operators.similarity import srp_multiprobe_pairs

    vecs = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    vecs.count()  # page cache
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()

    def run(k: int, n_bits: int) -> tuple[float, int, int]:
        d = _blowup_vectors(vecs, k)
        pairs = srp_multiprobe_pairs(
            d, "vec_id", "embedding", threshold=0.4, n_bits=n_bits, dim=64
        )
        t0 = time.perf_counter()
        n = pairs.count()
        t = time.perf_counter() - t0
        # within-replica pairs only (ids are vec_id*k + rep): the explosion
        # guard must ignore cross-replica pairs — the label clusters are
        # low-rank, so a sign-flipped cluster-centroid pair occasionally
        # lands above 0.4 by chance and contributes ~cluster_size^2 pairs
        # at once, an artifact of the synthetic decorrelation, not of the
        # pipeline (wall time already charges for rescoring them).
        within = (
            n
            if k == 1
            else pairs.filter((F.col("id1") % k) == (F.col("id2") % k)).count()
        )
        return t, n, within

    run(1, 8)  # codegen warm-up for the plan shape
    t1, n1, w1 = run(1, 8)
    t4, n4, w4 = run(4, 10)
    t16, n16, w16 = run(16, 12)
    print(f"\nsrp-multiprobe scale: 1x {t1:.2f}s/{n1} pairs, 4x {t4:.2f}s/{n4} ({w4} within), 16x {t16:.2f}s/{n16} ({w16} within)")
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    assert n1 > 0  # the rescore stage is exercised, not vacuously empty
    # each replica carries the corpus's exact pair structure (sign flips
    # are orthogonal), so within-replica recall per replica tracks the 1x
    # run and the within count must scale ~k, never quadratically
    assert w16 <= 32 * max(n1, 1) + 1000
    # same generous super-linearity trip wire as the other two families
    # (probes grow 9->13 with n_bits, well inside the 2.5x slack)
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_sharded_packing_bounded_waste_at_scale(spark):
    """Hierarchical-packing equivalence at 16M rows, 95% in ONE group:
    the sharded form's bin count stays within n_shards of the single-
    stream window's per group (<= 1 partial bin per sub-shard, in either
    direction — shard boundaries can also pack a tail tighter).

    Timing is PRINTED but not asserted: on one box both forms share the
    memory bus and a 15M-row narrow sort is cheap, so the measured A/B
    (PERF.md negative results) shows no local win.  The sharded form is
    the 100 TB path for a different reason — feasibility: a dominant
    group at corpus scale exceeds a single reducer's disk/2 GB shuffle
    block entirely, while sub-shards bound every sort to corpus/n_shards."""
    from trough_spark.operators.sampling import pack_sequences, pack_sequences_sharded

    n = 16_000_000
    df = (
        spark.range(0, n, 1, 32)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 20 != 0, F.lit("en"))
            .otherwise(F.concat(F.lit("l"), (F.col("id") % 20).cast("string")))
            .alias("lang"),
            (100 + F.pmod(F.col("id") * 37, F.lit(300))).alias("n_tokens"),
        )
        .cache()
    )
    try:
        df.count()  # materialize off the range generator

        def run(fn):
            out = fn()
            t0 = time.perf_counter()
            row = out.groupBy("lang").agg(
                F.count("*").alias("n"), (F.max("bin_id") + 1).alias("bins")
            ).collect()
            return time.perf_counter() - t0, {r["lang"]: r["bins"] for r in row}

        unsharded = lambda: pack_sequences(df, "doc_id", "n_tokens", 512, partition_by="lang")
        sharded = lambda: pack_sequences_sharded(
            df, "doc_id", "n_tokens", 512, n_shards=32, partition_by="lang"
        )
        run(unsharded)  # codegen warm-up
        t_un, bins_un = run(unsharded)
        t_sh, bins_sh = run(sharded)
        print(f"\nskewed packing 16M rows: per-group window {t_un:.2f}s, sharded {t_sh:.2f}s "
              f"({t_un / t_sh:.1f}x)")
        # bounded waste: per group within n_shards bins either way (each
        # sub-shard wastes at most one partial bin; sharded boundaries can
        # also pack a group's tail one bin TIGHTER than the single stream)
        for g, b in bins_un.items():
            assert abs(bins_sh[g] - b) <= 32, (g, b, bins_sh[g])
    finally:
        df.unpersist()


def test_span_coverage_scales_linearly(spark):
    """Second measured family (VERDICT r5 item 8): duplicated-span coverage
    over 1x/4x/16x dissimilar corpora.  Work is linear by construction —
    spans hash map-side, doc-frequency is one hash aggregate, the hot-span
    set joins back by 8-byte hash — so wall time must track corpus size."""
    from trough_spark.operators.dedup import duplicated_span_coverage

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    docs.count()  # page cache
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()

    def run(k: int) -> tuple[float, int]:
        d = _blowup(docs, k)
        cov = duplicated_span_coverage(d, "doc_id", "text", n=8, min_doc_freq=2)
        t0 = time.perf_counter()
        rows = cov.agg(F.count("*"), F.sum("dup_spans")).collect()[0]
        return time.perf_counter() - t0, int(rows[0])

    run(1)  # codegen warm-up for the plan shape
    t1, n1 = run(1)
    t4, n4 = run(4)
    t16, n16 = run(16)
    print(f"\nspan-coverage scale: 1x {t1:.2f}s/{n1} docs, 4x {t4:.2f}s/{n4}, 16x {t16:.2f}s/{n16}")
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    assert n4 == 4 * n1 and n16 == 16 * n1  # every replica produces its rows
    # same generous super-linearity trip wire as the LSH family
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_streaming_sink_fanout_scales_sublinearly(spark, tmp_path):
    """Fifth measured family (VERDICT r6 item 7): the threaded streaming
    MERGE sink at 1x/4x/16x touched-segment counts (2 / 8 / 32 segments
    per micro-batch).  Per-batch work is one bounded merge per touched
    segment fanned out on an 8-thread pool, so warm wall time should grow
    ~ceil(segments/threads) — 1, 1, 4 rounds — not linearly in segment
    count the way the old serial loop did (measured r6: serial 19.4 s vs
    threaded 4.9 s at 32 segments).  The tripwire separates those shapes."""
    from trough_spark.store import SegmentStore
    from trough_spark.streaming import events as E

    src_dir = tmp_path / "src"
    rows = spark.range(1500).select(
        F.col("id").alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        F.lit("click").alias("event_type"),
    )
    rows.repartition(3).write.mode("overwrite").parquet(str(src_dir))

    def run(nseg: int, store, ck: str) -> float:
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        enriched = stream.withColumn(
            "segment_id",
            F.concat(
                F.lit("z"), F.pmod(F.xxhash64("user_id"), F.lit(nseg)).cast("string")
            ),
        )
        t0 = time.perf_counter()
        q = (
            E.upsert_to_segments(
                enriched, store, "latest", ck,
                keys=["user_id", "ts"], schema_id="ev",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return time.perf_counter() - t0

    times: dict[int, float] = {}
    for nseg in (2, 8, 32):
        store = SegmentStore(spark, str(tmp_path / f"store{nseg}"))
        store.set_schema(
            "ev",
            "CREATE TABLE latest (user_id INTEGER, ts DATETIME, event_type TEXT, "
            "PRIMARY KEY (user_id, ts));",
        )
        run(nseg, store, str(tmp_path / f"ck_cold_{nseg}"))  # provisioning + codegen
        times[nseg] = run(nseg, store, str(tmp_path / f"ck_warm_{nseg}"))
        total = store.read_many_df("^z", "SELECT count(*) AS n FROM latest").collect()[0]["n"]
        assert total == 1500, (nseg, total)
    t2, t8, t32 = times[2], times[8], times[32]
    print(f"\nsink fan-out scale (warm replay): 2 segs {t2:.2f}s, 8 segs {t8:.2f}s, 32 segs {t32:.2f}s")
    print(f"ratios: 8/2 = {t8 / t2:.2f} (threaded ideal ~1, serial ~4), "
          f"32/2 = {t32 / t2:.2f} (threaded ideal ~4, serial ~16)")
    # tripwire between the threaded (~4x) and serial (~16x) shapes
    assert t32 <= max(t2, 1.0) * 9, (t2, t32)


def test_budget_prefix_sum_scales_linearly(spark):
    """Sixth measured family: the budget_select distributed prefix-sum at
    1x/4x/16x row counts with the budget scaled so the kept fraction is
    constant (~half).  The claim in numbers: every sort is bounded to
    corpus/n_ranges, so wall time tracks corpus size — the naive global
    ORDER BY window would instead funnel the whole corpus through one
    reducer and fall off a cliff at cluster scale."""
    import time

    from trough_spark.operators import sampling as SA

    def run(n: int) -> tuple[float, int]:
        df = spark.range(0, n, 1, 32).select(
            F.col("id"),
            ((F.col("id") * 37) % 1001 + 1).cast("bigint").alias("cost"),
            ((F.col("id") * 13) % 99991).cast("bigint").alias("score"),
        )
        out = SA.budget_select(
            df, "id", "cost", "score", budget=float(n) * 250.5, n_ranges=32
        )
        t0 = time.perf_counter()
        c = out.count()
        return time.perf_counter() - t0, c

    base = 2_000_000
    run(base)  # codegen warm-up for the plan shape
    t1, n1 = run(base)
    t4, n4 = run(4 * base)
    t16, n16 = run(16 * base)
    print(
        f"\nbudget prefix-sum: 1x {t1:.2f}s/{n1} kept, 4x {t4:.2f}s/{n4}, "
        f"16x {t16:.2f}s/{n16}"
    )
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    # constant kept fraction: the budget is half the expected total cost
    for n, kept in ((base, n1), (4 * base, n4), (16 * base, n16)):
        assert 0.4 * n < kept < 0.6 * n, (n, kept)
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_weighted_sample_topk_scales_linearly(spark):
    """Seventh measured family: Efraimidis-Spirakis weighted top-k at
    1x/4x/16x row counts with k fixed — TakeOrderedAndProject keeps a
    per-partition heap and the driver merges partitions*k rows, so wall
    time should track the scan (linear), never the sort (n log n on one
    reducer)."""
    import time

    from trough_spark.operators import sampling as SA

    def run(n: int) -> tuple[float, int]:
        df = spark.range(0, n, 1, 32).select(
            F.col("id"),
            ((F.col("id") * 31) % 997 + 1).cast("double").alias("w"),
        )
        out = SA.weighted_sample(df, "id", "w", k=256)
        t0 = time.perf_counter()
        c = out.count()
        return time.perf_counter() - t0, c

    base = 2_000_000
    run(base)  # codegen warm-up
    t1, n1 = run(base)
    t4, n4 = run(4 * base)
    t16, n16 = run(16 * base)
    print(
        f"\nweighted top-k: 1x {t1:.2f}s, 4x {t4:.2f}s, 16x {t16:.2f}s "
        f"(k={n1}/{n4}/{n16})"
    )
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    assert n1 == n4 == n16 == 256
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_dsir_scoring_scales_linearly(spark):
    """Eighth measured family (VERDICT r7 item 5): the full dsir_weights
    path — tokenize, unigram+bigram explode, hashed bucketing, per-(id,
    bucket) partial aggregation, 1024-row stats broadcast — at 1x/4x/16x
    corpus.  The claim in numbers: the ONLY data-sized shuffle carries
    (id, int bucket, count); the bucket-stats aggregate collapses to 1024
    rows before the broadcast join back, so wall time tracks the corpus
    (token volume), never a stats-table join or a global sort."""
    import time

    from pyspark.sql import functions as F

    from trough_spark.operators import sampling as SA

    def run(n: int) -> tuple[float, int]:
        # synthetic corpus: 12 zipf-ish tokens/doc over a 500-word
        # vocabulary; the target subset is a deterministic 1/7 slice
        df = spark.range(0, n, 1, 32).select(
            F.col("id"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sequence(1, 12), "
                    "i -> concat('w', pmod(id * i + i * i, 500)))"
                ),
            ).alias("text"),
        )
        out = SA.dsir_weights(df, "id", "text", F.col("id") % 7 == 0)
        t0 = time.perf_counter()
        c = out.count()
        return time.perf_counter() - t0, c

    base = 150_000
    run(base)  # codegen warm-up for the plan shape
    t1, n1 = run(base)
    t4, n4 = run(4 * base)
    t16, n16 = run(16 * base)
    print(
        f"\ndsir scoring: 1x {t1:.2f}s/{n1} docs, 4x {t4:.2f}s/{n4}, "
        f"16x {t16:.2f}s/{n16}"
    )
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    assert (n1, n4, n16) == (base, 4 * base, 16 * base)
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_interleave_order_scales_linearly(spark):
    """Ninth measured family (round 8): interleave_order at 1x/4x/16x
    corpus over 5 groups.  The claim in numbers: the enumeration is a
    range shuffle + per-slice row_number over (key, group) pairs (~16
    bytes/row), the histogram collapses to one row per group before the
    driver collect, and the position is a per-row CASE expression — so
    wall time tracks the corpus with no one-task-per-group sort and no
    global single-reducer window."""
    import time

    from pyspark.sql import functions as F

    from trough_spark.operators import sampling as SA

    def run(n: int) -> tuple[float, int]:
        df = spark.range(0, n, 1, 32).select(
            "id", F.concat(F.lit("g"), (F.col("id") % 5)).alias("g")
        )
        out = SA.interleave_order(df, "id", "g", n_ranges=32)
        t0 = time.perf_counter()
        # force pos (Catalyst could prune the window + CASE under a bare
        # count); sum of a 0..n-1 permutation is n*(n-1)/2 — asserted
        row = out.agg(
            F.count(F.lit(1)).alias("c"), F.sum("pos").alias("s")
        ).collect()[0]
        assert row["s"] == row["c"] * (row["c"] - 1) // 2
        return time.perf_counter() - t0, row["c"]

    base = 200_000
    run(base)  # codegen warm-up
    t1, n1 = run(base)
    t4, n4 = run(4 * base)
    t16, n16 = run(16 * base)
    print(
        f"\ninterleave: 1x {t1:.2f}s/{n1} rows, 4x {t4:.2f}s/{n4}, "
        f"16x {t16:.2f}s/{n16}"
    )
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    assert (n1, n4, n16) == (base, 4 * base, 16 * base)
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_ngram_novelty_scales_linearly(spark):
    """Tenth measured family (round 8): corpus n-gram novelty at 1x/4x/16x.
    The claim in numbers: the only data-sized exchanges carry (id, 16-byte
    digest) pairs — the distinct, the min-id groupBy, and the per-doc
    count — so wall time tracks total gram volume linearly."""
    import time

    from pyspark.sql import functions as F

    from trough_spark.operators.text import ngram_novelty

    def run(n: int) -> tuple[float, int]:
        df = spark.range(0, n, 1, 32).select(
            "id",
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sequence(1, 10), "
                    "i -> concat('w', pmod(id * i + i, 3000)))"
                ),
            ).alias("text"),
        )
        out = ngram_novelty(df, "id", "text")
        t0 = time.perf_counter()
        # count() alone would let Catalyst prune the whole novelty branch
        # (left join on unique keys preserves row count); force the values
        row = out.agg(
            F.count(F.lit(1)).alias("c"), F.sum("n_novel").alias("s")
        ).collect()[0]
        assert row["s"] is not None and row["s"] > 0
        return time.perf_counter() - t0, row["c"]

    base = 100_000
    run(base)  # codegen warm-up
    t1, n1 = run(base)
    t4, n4 = run(4 * base)
    t16, n16 = run(16 * base)
    print(
        f"\nnovelty: 1x {t1:.2f}s/{n1} docs, 4x {t4:.2f}s/{n4}, 16x {t16:.2f}s/{n16}"
    )
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    assert (n1, n4, n16) == (base, 4 * base, 16 * base)
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_near_dedup_keep_best_scales_linearly(spark):
    """Eleventh measured family: the FULL quality-aware near-dedup path
    (sign → LSH pairs → connected-component closure → keep-best) at
    1x/4x/16x dissimilar corpora.  The claim in numbers: signing is the
    data-sized term; the closure iterates only over edge-touching docs (a
    sliver, ~constant per replica); keep_best adds one partial-aggregable
    groupBy on the cluster label — so end-to-end wall tracks corpus size
    ~linearly even though the path contains an iterative algorithm."""
    import time

    from trough_spark.operators.dedup import (
        minhash_lsh_candidates_wide,
        minhash_signature_vector,
    )
    from trough_spark.operators.graph import connected_components, keep_best

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", F.length("text").cast("int").alias("n_chars")
    )
    docs.count()  # page cache

    def run(k: int) -> tuple[float, int, int]:
        d = _blowup(docs, k).withColumn("n_chars", F.length("text").cast("int"))
        t0 = time.perf_counter()
        sig = minhash_signature_vector(d, "doc_id", "text", num_perm=8, n=3)
        pairs = minhash_lsh_candidates_wide(sig, num_perm=8, rows_per_band=2)
        comp = connected_components(d.select("doc_id"), pairs, id_col="doc_id")
        out = keep_best(
            d.select("doc_id", "n_chars"), comp, id_col="doc_id", score_col="n_chars"
        )
        row = out.agg(
            F.count(F.lit(1)).alias("rows"), F.sum("is_kept").alias("kept")
        ).collect()[0]
        return time.perf_counter() - t0, row["rows"], row["kept"]

    run(1)  # codegen + CC-loop warm-up
    t1, r1, k1 = run(1)
    t4, r4, k4 = run(4)
    t16, r16, k16 = run(16)
    print(
        f"\nnear-dedup: 1x {t1:.2f}s {r1} rows/{k1} kept, "
        f"4x {t4:.2f}s {r4}/{k4}, 16x {t16:.2f}s {r16}/{k16}"
    )
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    # every doc gets a verdict; exactly one keeper per cluster
    assert (r1, r4, r16) == (r1, 4 * r1, 16 * r1)
    assert r1 // 2 <= k1 <= r1 and k4 <= r4 and k16 <= r16
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_cross_decontaminate_scales_linearly(spark):
    """12th measured family (round 9): cross-corpus near-dup subtraction.
    The reference side is FIXED (benchmark-sized, broadcast) while the
    corpus side blows up 1x/4x/16x — wall time must track the corpus scan
    ~linearly because the band join never shuffles the corpus (broadcast
    hash join) and the only data-sized exchange is (id, ref_id) collision
    pairs."""
    from trough_spark.operators.dedup import cross_corpus_near_dup

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    docs.count()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()
    ref_sig = minhash_signature_vector(
        docs.filter(F.col("doc_id") < 500), "doc_id", "text", num_perm=8, n=3
    ).localCheckpoint()

    def run(k: int) -> tuple[float, int]:
        corpus = _blowup(docs.filter(F.col("doc_id") >= 500), k)
        sig = minhash_signature_vector(corpus, "doc_id", "text", num_perm=8, n=3)
        out = cross_corpus_near_dup(sig, ref_sig)
        t0 = time.perf_counter()
        n = out.count()
        return time.perf_counter() - t0, n

    run(1)  # codegen warm-up
    t1, n1 = run(1)
    t4, n4 = run(4)
    t16, n16 = run(16)
    print(f"\ncross-decon: 1x {t1:.2f}s/{n1} rows, 4x {t4:.2f}s/{n4}, 16x {t16:.2f}s/{n16}")
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    assert n4 == 4 * n1 and n16 == 16 * n1  # one output row per corpus doc
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_bpe_train_scales_with_word_count(spark):
    """13th measured family (round 9): BPE merge training.  The corpus-
    sized term is the ONE word-count shuffle; each merge then iterates on
    the distinct-word table.  The dissimilar blow-up multiplies BOTH the
    corpus and the vocabulary, so wall time should track ~linearly — the
    claim the operator docstring makes (vocab-sized iterations, never
    corpus² work)."""
    from trough_spark.operators.text import bpe_train_merges

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    docs.count()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()

    def run(k: int) -> tuple[float, int]:
        d = _blowup(docs, k)
        t0 = time.perf_counter()
        out = bpe_train_merges(d, "doc_id", "text", n_merges=2)
        n = out.count()
        return time.perf_counter() - t0, n

    run(1)  # codegen warm-up
    t1, n1 = run(1)
    t4, n4 = run(4)
    t16, n16 = run(16)
    print(f"\nbpe-train: 1x {t1:.2f}s/{n1} merges, 4x {t4:.2f}s, 16x {t16:.2f}s")
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    assert n1 == n4 == n16 == 2
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)


def test_length_batches_scale_with_degenerate_distribution(spark):
    """14th measured family (round 10, VERDICT r9 item 7): length-bucketed
    smart batching under a DEGENERATE length distribution — 90% of the
    corpus lands in ONE power-of-two bucket.  The operator's skew story
    (interleave_order's range-slice enumeration instead of a
    one-task-per-bucket window) is asserted structurally elsewhere; this
    measures it: wall time must track ~linearly in corpus size even when
    a single bucket holds nearly everything, and the giant bucket must
    not serialize the job."""
    from trough_spark.operators.sampling import length_bucket_batches

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id")
    docs.count()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()

    def with_lengths(d):
        # 90% of ids -> lengths 520..919 (all bucket 9); the tail spreads
        # over buckets 4..7
        return d.select(
            "doc_id",
            F.when(
                F.pmod("doc_id", 10) < 9, 520 + F.pmod("doc_id", 400)
            ).otherwise(16 + F.pmod("doc_id", 7) * 30).alias("len"),
        )

    def run(k: int) -> tuple[float, int, int]:
        d = with_lengths(_blowup(docs.withColumn("text", F.lit("x")), k).select("doc_id"))
        out = length_bucket_batches(d, "doc_id", "len", batch_size=16)
        t0 = time.perf_counter()
        rows = out.agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("n_docs").alias("n_docs"),
            F.sum(F.when(F.col("bucket") == 9, F.col("n_docs")).otherwise(0)).alias("big"),
            F.min("waste").alias("min_waste"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        assert rows["min_waste"] >= 0
        assert rows["big"] >= (rows["n_docs"] * 85) // 100  # degenerate indeed
        return dt, rows["n_batches"], rows["n_docs"]

    run(1)  # codegen warm-up
    t1, b1, d1 = run(1)
    t4, b4, d4 = run(4)
    t16, b16, d16 = run(16)
    print(
        f"\nlength-batches: 1x {t1:.2f}s {b1} batches/{d1} docs, "
        f"4x {t4:.2f}s {b4}/{d4}, 16x {t16:.2f}s {b16}/{d16}"
    )
    print(f"ratios: 4x/1x = {t4 / t1:.2f} (ideal 4), 16x/1x = {t16 / t1:.2f} (ideal 16)")
    assert d4 == 4 * d1 and d16 == 16 * d1  # every doc batched at every scale
    # batch count scales with docs (fixed batch_size), +/- per-bucket remainders
    assert b16 >= 15 * b1 and b16 <= 17 * b1 + 8
    assert t16 <= max(t1, 0.5) * 16 * 2.5, (t1, t16)
