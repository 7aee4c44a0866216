#!/usr/bin/env python
"""Cold per-query timing harness for round-11 A/B decisions.

Matches bench.py's methodology exactly — fresh JVM per run, the same
warm-up convention (one untimed query, per-table page-cache pulls, Arrow
worker-pool start, JIT settle), cold = first build+collect, warm = second —
but times only the queries named on the command line, so a single A/B
decision doesn't cost a full 130-query bench pass.

    python plans/r11/coldq.py dedup_ngram_jaccard b5_join_multiway

Env: COLDQ_RUNS (default 3) fresh-JVM children; SPARK_GRAFT_SF_DIR /
SPARK_GRAFT_CPUS as in bench.py.  Prints one JSON line with per-query
cold/warm medians and the per-run raw values.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def child(names: list[str]) -> None:
    from trough_spark.queries import QUERIES, load_all
    from trough_spark.session import get_spark
    from trough_spark.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark(app_name="coldq")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["b6_agg_pricing_summary"](spark, sf_dir).collect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        load_table(spark, sf_dir, t).count()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()
    time.sleep(float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "10")))
    cold, warm = {}, {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        warm[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"cold": cold, "warm": warm}))


def main() -> None:
    if sys.argv[1] == "--child":
        child(sys.argv[2:])
        return
    names = sys.argv[1:]
    runs = int(os.environ.get("COLDQ_RUNS", "3"))
    results = []
    for _ in range(runs):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", *names],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    med = {
        phase: {
            n: round(statistics.median(r[phase][n] for r in results), 3)
            for n in names
        }
        for phase in ("cold", "warm")
    }
    print(
        json.dumps(
            {
                "runs": runs,
                "cold": med["cold"],
                "warm": med["warm"],
                "raw_cold": [r["cold"] for r in results],
                "raw_warm": [r["warm"] for r in results],
            }
        )
    )


if __name__ == "__main__":
    main()
