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


def test_ivfpq_full_probe_equals_plain_adc(spark, emb):
    """nprobe == number of lists ⇒ the IVF stage prunes nothing, so IVF+PQ
    must return exactly what the plain (all-codes) ADC top-k returns over
    the same corpus minus the query vector."""
    from trough_spark.operators import vectors as V

    cb = V.pq_split(emb.filter(F.col("vec_id") < 8), "vec_id", "embedding", 4, 64).select(
        F.col("id").alias("code"), "sub_id", F.col("sv").alias("cv")
    )
    query = emb.filter(F.col("vec_id") == 0)
    full = V.ivfpq_topk(
        emb, "vec_id", "embedding",
        centroids=emb.filter(F.col("vec_id") < 16), codebooks=cb, query=query,
        k=10, nprobe=16, m=4, dim=64,
    )
    corpus = emb.filter(F.col("vec_id") != 0)
    codes = V.pq_encode(corpus, "vec_id", "embedding", cb, m=4, dim=64)
    qsub = V.pq_split(query, "vec_id", "embedding", 4, 64).select(
        "sub_id", F.col("sv").alias("qv")
    )
    plain = V.pq_adc_topk(codes, cb, qsub, k=10, m=4, width=16)
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in plain.collect()]


def test_ivfpq_candidates_are_probe_subset(spark, emb):
    """With nprobe < lists, every returned id must belong to a probed
    inverted list (no candidate can leak in from an unprobed list)."""
    from trough_spark.operators import vectors as V
    from trough_spark.operators.similarity import cosine

    cents = emb.filter(F.col("vec_id") < 16)
    cb = V.pq_split(emb.filter(F.col("vec_id") < 8), "vec_id", "embedding", 4, 64).select(
        F.col("id").alias("code"), "sub_id", F.col("sv").alias("cv")
    )
    query = emb.filter(F.col("vec_id") == 0)
    out = V.ivfpq_topk(
        emb, "vec_id", "embedding", centroids=cents, codebooks=cb, query=query,
        k=10, nprobe=2, m=4, dim=64,
    )
    got_ids = {r["id"] for r in out.collect()}
    lists = S.ivf_assign(emb, "vec_id", "embedding", cents, dim=64).select("id", "cid")
    # recompute the 2 probed lists independently
    c = cents.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    qscored = (
        query.select(F.col("embedding").alias("qv"))
        .crossJoin(c)
        .select("cid", F.round(cosine(F.col("qv"), F.col("cv"), 64), 6).alias("s"))
        .collect()
    )
    probed = {r["cid"] for r in sorted(qscored, key=lambda r: (-r["s"], r["cid"]))[:2]}
    member = {r["id"] for r in lists.collect() if r["cid"] in probed}
    assert got_ids <= member and 0 not in got_ids


def test_srp_incremental_never_joins_corpus_to_itself(spark, emb):
    """Every (new_id, corpus_id) pair crosses the partition boundary, ranks
    are dense from 1, and per-new-vector result counts never exceed k."""
    from trough_spark.operators.similarity import srp_incremental_topk

    new = emb.filter(F.col("vec_id") % 20 == 0)
    corpus = emb.filter(F.col("vec_id") % 20 != 0)
    out = srp_incremental_topk(corpus, new, "vec_id", "embedding", k=3).collect()
    assert out, "bucketed retrieval returned nothing"
    by_new = {}
    for r in out:
        assert r["new_id"] % 20 == 0 and r["corpus_id"] % 20 != 0
        by_new.setdefault(r["new_id"], []).append(r["rnk"])
    for ranks in by_new.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
