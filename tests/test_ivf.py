"""IVF ANN properties: assignment correctness, probe-subset candidates,
and exactness when every list is probed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trough_spark.operators import similarity as S
from trough_spark.tables import load_table as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return T(spark, SF, "embeddings")


def test_ivf_assign_every_vector_once(spark, emb):
    cents = emb.filter(F.col("vec_id") < 8)
    lists = S.ivf_assign(emb, "vec_id", "embedding", cents, dim=64)
    n = emb.count()
    assert lists.count() == n
    assert lists.select("id").distinct().count() == n
    cids = {r["cid"] for r in lists.select("cid").distinct().collect()}
    assert cids <= set(range(8))


def test_ivf_assign_is_argmax(spark, emb):
    """Each vector's assigned centroid really is the max-cosine one (ties to
    the lower cid), checked against an independent cross-join argmax."""
    cents = emb.filter(F.col("vec_id") < 8)
    lists = S.ivf_assign(emb, "vec_id", "embedding", cents, dim=64)
    got = {r["id"]: r["cid"] for r in lists.collect()}

    c = cents.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    scored = (
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
        .crossJoin(c)
        .select(
            "id", "cid", F.round(S.cosine(F.col("v"), F.col("cv"), 64), 6).alias("s")
        )
        .collect()
    )
    best = {}
    for r in scored:
        cur = best.get(r["id"])
        if cur is None or (-r["s"], r["cid"]) < cur[0]:
            best[r["id"]] = ((-r["s"], r["cid"]), r["cid"])
    assert got == {i: b[1] for i, b in best.items()}


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    """nprobe == number of lists ⇒ every candidate is visited ⇒ IVF output
    is exactly the brute-force top-k."""
    cents = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") < 5)
    ivf = S.ivf_topk(
        emb, queries, "vec_id", "embedding", cents, k=4, nprobe=8, dim=64
    )
    exact = S.cosine_topk_bruteforce(emb, queries, "vec_id", "embedding", k=4, dim=64)
    key = ["query_id", "rnk"]
    a = {(r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine_sim"]) for r in ivf.collect()}
    b = {(r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine_sim"]) for r in exact.collect()}
    assert a == b


def test_ivf_candidates_only_from_probed_lists(spark, emb):
    cents = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") < 3)
    lists = S.ivf_assign(emb, "vec_id", "embedding", cents, dim=64)
    assign = {r["id"]: r["cid"] for r in lists.collect()}
    out = S.ivf_topk(
        emb, queries, "vec_id", "embedding", cents, k=10, nprobe=2, dim=64
    ).collect()
    # reconstruct each query's probed lists independently
    c = cents.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    qs = (
        queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .crossJoin(c)
        .select("qid", "cid", F.round(S.cosine(F.col("qv"), F.col("cv"), 64), 6).alias("s"))
        .collect()
    )
    per_q = {}
    for r in qs:
        per_q.setdefault(r["qid"], []).append((-r["s"], r["cid"]))
    probed = {q: {cid for _, cid in sorted(v)[:2]} for q, v in per_q.items()}
    for r in out:
        assert assign[r["neighbor_id"]] in probed[r["query_id"]], r
