"""Connected-components operator: closure correctness on chains, rings,
and disconnected parts; canonical selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from trough_spark.operators import graph as G


def _cc(spark, n_nodes, edge_list, **kw):
    nodes = spark.createDataFrame([(i,) for i in n_nodes], "id bigint")
    edges = spark.createDataFrame(
        edge_list or [(None, None)], "id1 bigint, id2 bigint"
    ).where(F.col("id1").isNotNull())
    out = G.connected_components(nodes, edges, **kw)
    return {r["id"]: r["comp"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 0-1-2-3-4 chain: diameter 4, all label 0
    got = _cc(spark, range(5), [(i, i + 1) for i in range(4)])
    assert got == {i: 0 for i in range(5)}


def test_disconnected_components_stay_apart(spark):
    got = _cc(spark, range(6), [(0, 1), (1, 2), (4, 5)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_ring_and_cross_edges(spark):
    got = _cc(spark, range(8), [(0, 1), (1, 2), (2, 0), (5, 6), (6, 7), (7, 5), (2, 5)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 0, 6: 0, 7: 0}


def test_isolated_nodes_self_label(spark):
    got = _cc(spark, range(3), [])
    assert got == {0: 0, 1: 1, 2: 2}


def test_max_iter_never_wrongly_merges(spark):
    # a 10-chain cut off after 2 rounds: over-segmented is fine, but every
    # label must still be a member of the node's true component
    got = _cc(spark, range(10), [(i, i + 1) for i in range(9)], max_iter=2)
    assert all(lbl <= i for i, lbl in got.items())
    full = _cc(spark, range(10), [(i, i + 1) for i in range(9)])
    assert full == {i: 0 for i in range(10)}


def test_keep_canonical(spark):
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id bigint")
    edges = spark.createDataFrame([(1, 3), (3, 4)], "id1 bigint, id2 bigint")
    comp = G.connected_components(nodes, edges, id_col="doc_id")
    out = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"], r["is_canonical"])
        for r in G.keep_canonical(nodes, comp, id_col="doc_id").collect()
    }
    assert out == {
        0: (0, 1, 1),
        1: (1, 3, 1),
        2: (2, 1, 1),
        3: (1, 3, 0),
        4: (1, 3, 0),
    }


def test_star_cc_matches_propagation_on_long_chain(spark):
    # A 40-node chain is the adversarial case for label propagation
    # (diameter rounds); star contraction must produce the identical
    # labeling in O(log n) rounds.
    from trough_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    nodes = spark.range(50).select(F.col("id"))
    chain = [(i, i + 1) for i in range(39)]  # 0..39 one component
    extra = [(45, 47), (47, 49)]  # small component; 40-44,46,48 isolated
    edges = spark.createDataFrame(chain + extra, "id1 long, id2 long")
    star = {
        (r.id, r.comp)
        for r in connected_components_star(nodes, edges, max_iter=8).collect()
    }
    prop = {
        (r.id, r.comp)
        for r in connected_components(nodes, edges, max_iter=50).collect()
    }
    assert star == prop
    assert all(c == 0 for i, c in star if i <= 39)
    assert (49, 45) in star and (44, 44) in star


def test_keep_best_prefers_high_score_then_min_id(spark):
    # cluster {0,1,2}: scores 5, 9, 9 -> keep 1 (highest score, lowest id
    # among the tie); singleton {3} keeps itself
    comp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3)], "id bigint, comp bigint"
    )
    scored = spark.createDataFrame(
        [(0, 5), (1, 9), (2, 9), (3, 1)], "doc_id bigint, score int"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["keep_id"], r["cluster_size"], r["is_kept"])
        for r in G.keep_best(
            scored, comp, id_col="doc_id", score_col="score"
        ).collect()
    }
    assert out == {
        0: (0, 1, 3, 0),
        1: (0, 1, 3, 1),
        2: (0, 1, 3, 0),
        3: (3, 3, 1, 1),
    }


def test_keep_best_vs_keep_canonical_disagree_when_best_is_not_min(spark):
    # the point of the operator: canonical (min id) keeps 0, best keeps 2
    from trough_spark.operators import graph as G2

    comp = spark.createDataFrame([(0, 0), (1, 0), (2, 0)], "id bigint, comp bigint")
    scored = spark.createDataFrame(
        [(0, 10), (1, 20), (2, 30)], "doc_id bigint, score int"
    )
    best = G2.keep_best(scored, comp, id_col="doc_id", score_col="score")
    assert {r["doc_id"] for r in best.collect() if r["is_kept"] == 1} == {2}
