#!/usr/bin/env python
"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end including result materialization
(collect()), after one untimed warm-up query to absorb JVM/codegen start-up.

Round-6+: every recorded number is the per-query MEDIAN over
$SPARK_GRAFT_BENCH_RUNS (default 3) fresh-JVM child runs — the hand-run
convention PERF.md's cross-round comparisons already used, now the recorded
artifact itself (single runs recorded two phantom streaming "regressions" in
round 5).  Set SPARK_GRAFT_BENCH_RUNS=1 to time a single in-process pass
while iterating.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trough_spark.queries import QUERIES, load_all
from trough_spark.session import get_spark

HEADLINE = [
    # relational core
    "b5_join_multiway",
    "b6_agg_pricing_summary",
    "b8_window_functions",
    "b9_topk_per_group",
    "b11_subqueries_cte",
    "a12_fanout_regex",
    # llm-pipeline operators
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_cosine_pairs",
    "sim_ann_topk",
    "text_quality_features",
    "text_fingerprint",
    # streaming (batch mode)
    "stream_tumbling_hourly",
    "stream_sessionization",
    # temporal + skew operators
    "asof_join_last_signup",
    "text_tfidf_top_terms",
    "skew_salted_aggregation",
]

# round-2+ additions, timed under "queries_extra" (not in the headline sum)
EXTRA = [
    "b8_groups_frames",
    "sketch_hll_distinct",
    "sketch_countmin_heavy_hitters",
    "sim_ivf_topk",
    "dedup_connected_components",
    "sample_hash_split",
    "pack_sequences",
    "pipeline_curation",
    "dedup_simhash_pairs",
    "sim_srp_multiprobe_pairs",
    "dedup_incremental",
    "text_unigram_logprob",
    "stream_stream_join",
    "sim_kmeans_update",
    "bloom_semijoin_prune",
    "text_pii_scrub",
    "text_chunk_windows",
    "sim_kmeans_train",
    "dedup_cc_star",
    "sketch_equidepth_histogram",
    "skew_salted_join",
    "dedup_span_coverage",
    "text_bm25_search",
    "sample_mix_rebalance",
    "sim_semantic_dedup",
    "stream_cohort_retention",
    # round-3 additions
    "b7_cube_grouping_sets",
    "b6_pivot_priority",
    "dedup_fuzzy_levenshtein",
    "text_surt_canonicalize",
    "text_outlier_mad",
    "events_attribution_touch",
    "layout_zorder_key",
    "vec_pq_encode",
    "vec_pq_adc_topk",
    "vec_pq_recall",
    "sample_bottom_k_per_group",
    "sim_matryoshka_topk",
    "stream_dedup_ids",
    "dedup_minhash_verify",
    "multimodal_resize",
    "text_quality_ntile",
    # round 4
    "vec_ivfpq_search",
    "sim_incremental_ann",
    "text_html_strip",
    "sample_group_cap",
    "events_multigrain_rollup",
    "text_classifier_score",
    "dedup_chunk_rewrite",
    "multimodal_phash",
    "sketch_kmv_quantiles",
    "sketch_source_overlap",
    "text_hashed_embedding",
    "text_hashed_ann_topk",
    # round 6
    "b12_dialect_shim_roundtrip2",
    "sample_train_order",
    "pack_sequences_sharded",
    # round 7
    "sample_temperature_lang",
    "sample_dsir_weights",
    "sample_weighted_es",
    "sample_weighted_per_lang",
    "sample_budget_select",
    "sample_budget_per_lang",
    "pipeline_dsir_budget",
    # round 8
    "dedup_containment",
    "pipeline_url_dedup",
    "text_gopher_rules",
    "text_ngram_novelty",
    "sample_interleave_lang",
    "text_token_entropy",
    "text_bigram_logprob",
    # round 8, second session
    "pipeline_near_dedup",
    "dedup_source_matrix",
    "text_pmi_cooccurrence",
    "text_c4_filters",
    "events_rate_anomaly",
    "vec_bq_hamming_topk",
    "vec_bq_rescore_topk",
    "b12_shim_window_filter",
    "b12_shim_json_each",
    "sample_cluster_split",
    "text_ccnet_bucket",
    # round 9
    "dedup_cross_decontaminate",
    "sample_repeat_upsample",
    "text_bpe_train",
    "text_bpe_segment",
    "sample_length_batches",
    "b12_shim_literal_escape",
    "pipeline_bpe_pack",
    # round 10
    "b12_shim_json_tree",
    "text_bpe_encode",
    "pipeline_bpe_pack_ids",
]


def _calib_spin() -> float:
    """Fixed-work single-thread spin: ~1.2 s on the documented host band.
    Pure Python so it measures host CPU throughput, nothing Spark."""
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i * i
    return round(time.perf_counter() - t0, 3)


def one_pass() -> tuple[dict, dict, dict, str]:
    """One fresh-JVM timing pass: (cold, warm, extra, sf) per-query seconds."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    # SPARK_GRAFT_SHUFFLE overrides spark.sql.shuffle.partitions for
    # partition-count sensitivity runs (PERF.md round-8 experiment);
    # unset = the session default (2x cores, AQE coalescing on)
    _sp = os.environ.get("SPARK_GRAFT_SHUFFLE")
    spark = get_spark(
        app_name="trough-spark-bench",
        shuffle_partitions=int(_sp) if _sp else None,
    )
    spark.sparkContext.setLogLevel("WARN")

    # Warm-up convention (round 5+): before any timing, (a) one untimed
    # query absorbs JVM/codegen start-up, and (b) one untimed count() per
    # input table pulls every parquet file through the OS page cache.
    # Without (b) the first run of the first JVM pays disk I/O no later run
    # pays (PERF.md documented a 29.9 s first-session outlier vs a
    # 21.7-22.6 s steady spread), so "cold" sums weren't comparable across
    # rounds.  "Cold" therefore means cold-plan/cold-codegen, warm page
    # cache — deterministic round over round.
    QUERIES["b6_agg_pricing_summary"](spark, sf_dir).collect()
    from trough_spark.tables import load_table

    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        load_table(spark, sf_dir, t).count()
    # (c) start the Arrow Python worker pool once — otherwise the first
    # pandas-kernel query in the timed set pays the per-executor-thread
    # python fork + Arrow init that every later pandas query gets for free
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()
    # (d) JIT settle (round 7): session init + the warm-ups above enqueue a
    # large background C2 compile backlog; on a fresh JVM those compiler
    # threads compete with the first timed queries for cores, taxing
    # whichever queries run first (measured: reversing HEADLINE order moved
    # the inflation to the new first block — b8 1.00→0.39 s when moved
    # late, skew_salted 0.52→1.23 s when moved first; a 10 s settle cut the
    # first-block tax by 25-45% and the whole pass 28.9→22.3 s).  Without
    # this, round-over-round medians show phantom per-query "regressions"
    # on early-position queries (VERDICT r6 Wrong #2).
    time.sleep(float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "10")))

    # pre-pass host-speed spin (round 8): paired with calib_spin_1t below
    # so WITHIN-run drift is visible, not just cross-round drift
    extra_pre_spin = _calib_spin()

    times: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 3)
        # second run: steady-state (no per-plan codegen compile)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        warm[name] = round(time.perf_counter() - t0, 3)

    # operators added after the round-1 baseline: timed separately so the
    # headline `value` stays comparable round-over-round
    extra: dict[str, float] = {}
    for name in EXTRA:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        extra[name] = round(time.perf_counter() - t0, 3)

    # Host-speed calibration anchor (round 7): a fixed-work pure-Python
    # spin whose wall time depends only on how fast this box is right now.
    # Back-to-back median-of-3 invocations measured 24.4 vs 30.6 s totals
    # with ZERO code change and an idle guest (Firecracker surfaces no
    # steal%), so host throughput drift is real and otherwise invisible.
    # Cross-round per-query comparisons should divide by this anchor
    # before calling anything a regression.  Round 8: the spin runs BEFORE
    # (calib_spin_pre) and AFTER (calib_spin_1t) the timed pass, and the
    # emitted value_norm / queries_norm are pre-divided by
    # (calib_spin_1t / 1.2) — 1.2 s being the documented mid-band — so the
    # artifact itself is drift-corrected (VERDICT r7 item 2).
    extra["calib_spin_pre"] = extra_pre_spin
    extra["calib_spin_1t"] = _calib_spin()

    # Point-read latency floor (VERDICT r6 item 8): the reference's perf
    # thesis is that the worst case is one small shard
    # (reference README.rst:16-31); the engine's equivalent is a
    # single-segment read on a tiny provisioned segment.  Records the
    # first (cold-plan) read and the steady-state median of 20 — the
    # per-query Spark overhead a point-read client would see.
    import statistics as _stats
    import tempfile

    from trough_spark.store import SegmentStore

    with tempfile.TemporaryDirectory() as td:
        pstore = SegmentStore(spark, os.path.join(td, "pr_store"))
        pstore.set_schema(
            "pr", "CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT);"
        )
        pstore.provision("prseg", "pr")
        pstore.write(
            "prseg",
            "INSERT INTO kv VALUES "
            + ",".join(f"({i},'v{i}')" for i in range(1000))
            + ";",
        )
        t0 = time.perf_counter()
        assert pstore.read("prseg", "SELECT v FROM kv WHERE k = %s", (17,))
        extra["point_read_cold"] = round(time.perf_counter() - t0, 3)
        lat = []
        for i in range(20):
            t0 = time.perf_counter()
            pstore.read("prseg", "SELECT v FROM kv WHERE k = %s", (i,))
            lat.append(time.perf_counter() - t0)
        extra["point_read_p50"] = round(_stats.median(lat), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return times, warm, extra, sf


def _emit(times: dict, warm: dict, extra: dict, sf: str, runs: int) -> None:
    # The driver tail-captures only ~2 KB of stdout and parses the LAST JSON
    # line; the extras dict (40+ entries) goes on its own EARLIER line so the
    # canonical line below stays small enough to survive the capture.
    # Anchor normalization (round 8): divide by (calib_spin_1t / 1.2) so
    # cross-round artifact comparison is host-drift-corrected at the
    # source; 1.2 s = the documented mid-band spin on this host class.
    anchor = extra.get("calib_spin_1t") or 1.2
    scale = anchor / 1.2
    queries_norm = {k: round(v / scale, 3) for k, v in times.items()}
    print(json.dumps({"queries_extra": extra, "queries_norm": queries_norm}))
    print(
        json.dumps(
            {
                "metric": "headline query set wall time (cold plan, warm "
                f"page cache; median of {runs} fresh-JVM runs; "
                "queries_warm = 2nd run)",
                "value": round(sum(times.values()), 3),
                "value_norm": round(sum(times.values()) / scale, 3),
                "calib_spin_pre": extra.get("calib_spin_pre"),
                "calib_spin_1t": extra.get("calib_spin_1t"),
                "unit": "sec",
                "queries": times,
                "queries_warm": warm,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "runs": runs,
            }
        )
    )


def _median_each(dicts: list[dict]) -> dict:
    keys = dicts[0].keys() if dicts else []
    return {
        k: round(statistics.median(d[k] for d in dicts if k in d), 3)
        for k in keys
    }


def main() -> None:
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD") == "1" or runs <= 1:
        times, warm, extra, sf = one_pass()
        _emit(times, warm, extra, sf, runs=1)
        return
    # parent: median over `runs` fresh-JVM children (one JVM per child
    # process — cold numbers stay genuinely cold-plan in every run).
    # Time-boxed: if the budget runs out after >=1 completed child, emit
    # medians of the completed runs rather than risking a caller timeout.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "900"))
    t_start = time.perf_counter()
    results = []
    env = {**os.environ, "SPARK_GRAFT_BENCH_CHILD": "1"}
    for i in range(runs):
        if results and i > 0:
            elapsed = time.perf_counter() - t_start
            if elapsed + elapsed / i > budget:
                break  # another child would likely blow the budget
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        extra = json.loads(lines[-2])["queries_extra"]
        canon = json.loads(lines[-1])
        results.append((canon["queries"], canon["queries_warm"], extra, canon["sf"]))
    times = _median_each([r[0] for r in results])
    warm = _median_each([r[1] for r in results])
    extra = _median_each([r[2] for r in results])
    _emit(times, warm, extra, str(results[0][3]), runs=len(results))


if __name__ == "__main__":
    main()
