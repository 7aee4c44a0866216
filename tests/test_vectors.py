"""Vector ops: int8 quantization bounds/fidelity, deterministic k-means
update invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from trough_spark.operators import vectors as V


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_quantize_bounds_and_zero_vector(spark):
    df = _emb(spark, [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])])
    out = {(r["id"], r["pos"]): r["q"] for r in V.quantize_embeddings(df, "vec_id", "embedding").collect()}
    assert out[(1, 1)] == -127  # the max-magnitude component hits the rail
    assert out[(1, 0)] == 64  # round(1.0 * 127 / 2.0) = round(63.5) = 64
    assert out[(1, 2)] == 32  # round(31.75) = 32
    assert out[(2, 0)] == out[(2, 1)] == out[(2, 2)] == 0
    assert all(-127 <= v <= 127 for v in out.values())


def test_quantization_error_bounded_by_half_step(spark):
    df = _emb(spark, [(1, [0.3, -0.7, 0.11, 0.999]), (2, [5.0, -5.0, 2.5, 0.01])])
    for r in V.quantization_error(df, "vec_id", "embedding").collect():
        # per-component error of symmetric int8 is <= amax/254 (+ grid slop)
        assert r["mean_abs_err"] <= r["amax"] / 254 + 2e-6, r


def test_kmeans_update_partitions_all_vectors(spark):
    rows = [(i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(40)]
    df = _emb(spark, rows)
    cents = df.filter(F.col("vec_id") < 3)
    out = V.kmeans_update_step(df, "vec_id", "embedding", cents).collect()
    # flat rows: every (cid) has dim entries; member counts sum to N per dim
    by_pos = {}
    for r in out:
        by_pos.setdefault(r["pos"], 0)
        by_pos[r["pos"]] += r["n_members"]
    assert set(by_pos.values()) == {40}
    assert {r["pos"] for r in out} == {0, 1, 2}


def test_kmeans_singleton_cluster_reproduces_vector(spark):
    # two far-apart directions; each centroid captures itself
    df = _emb(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    out = {
        (r["cid"], r["pos"]): (r["val"], r["n_members"])
        for r in V.kmeans_update_step(df, "vec_id", "embedding", df).collect()
    }
    assert out[(0, 0)] == (1.0, 1)
    assert out[(0, 1)] == (0.0, 1)
    assert out[(1, 0)] == (0.0, 1)
    assert out[(1, 1)] == (1.0, 1)


def test_kmeans_update_is_deterministic_across_layouts(spark):
    rows = [(i, [float((i * 3) % 7) - 3, float((i * 11) % 13) / 6]) for i in range(60)]
    df = _emb(spark, rows)
    cents = df.filter(F.col("vec_id") < 4)
    a = sorted(map(tuple, V.kmeans_update_step(df, "vec_id", "embedding", cents).collect()))
    b = sorted(
        map(
            tuple,
            V.kmeans_update_step(df.repartition(17), "vec_id", "embedding", cents).collect(),
        )
    )
    assert a == b


def test_kmeans_train_is_deterministic_across_layouts(spark):
    import random

    random.seed(7)
    data = [
        (i, [round(random.uniform(-1, 1), 3) for _ in range(8)]) for i in range(60)
    ]
    a = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    b = a.repartition(13, "vec_id")
    out_a = sorted(
        map(tuple, V.kmeans_train(a, "vec_id", "embedding", a.filter("vec_id < 4"), 3).collect())
    )
    out_b = sorted(
        map(tuple, V.kmeans_train(b, "vec_id", "embedding", b.filter("vec_id < 4"), 3).collect())
    )
    assert out_a == out_b
    assert sum(r[3] for r in out_a if r[1] == 0) == 60  # every vector assigned


def test_semantic_dedup_drops_near_copy_keeps_distinct(spark):
    from trough_spark.operators.vectors import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid seed / keeper
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid seed, orthogonal
        (5, [0.99, 0.01, 0.0, 0.0]), # near-copy of 0 -> dropped
        (6, [0.0, 0.98, 0.02, 0.0]), # near-copy of 1 -> dropped
        (7, [0.6, 0.6, 0.0, 0.0]),   # between clusters, < threshold to both? no:
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(
        df, "vec_id", "embedding", df.where("vec_id < 2"), threshold=0.95, dim=4
    )
    got = {r.id: (r.cid, r.kept) for r in out.collect()}
    assert got[0] == (0, 1) and got[1] == (1, 1)
    assert got[5][1] == 0 and got[5][0] == 0   # dropped into cluster 0
    assert got[6][1] == 0 and got[6][0] == 1
    assert got[7][1] == 1                      # 45-degree vector survives 0.95
    # all inputs accounted for
    assert set(got) == {0, 1, 5, 6, 7}


def test_binary_quantize_known_bits(spark):
    from trough_spark.operators.vectors import binary_quantize

    # dims 0 and 2 positive in the low half; dim 32 positive in the high half
    vec = [0.0] * 64
    vec[0] = 1.0
    vec[2] = 0.5
    vec[1] = -3.0
    vec[32] = 2.0
    df = spark.createDataFrame(
        [(7, vec)], "vec_id bigint, embedding array<float>"
    )
    row = binary_quantize(df, "vec_id", "embedding").collect()[0]
    assert row["code_lo"] == (1 << 0) + (1 << 2)
    assert row["code_hi"] == (1 << 0)


def test_bq_hamming_identical_vector_ranks_first(spark):
    from trough_spark.operators.vectors import bq_hamming_topk

    import random

    rng = random.Random(11)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    flipped = list(base)
    flipped[5] = -flipped[5] if flipped[5] != 0 else 1.0  # one sign flip
    rows = [(0, base), (50, list(base)), (51, flipped)]
    # noise vectors far from base
    for i in range(52, 60):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = bq_hamming_topk(df, "vec_id", "embedding", n_queries=1, k=3).collect()
    assert out[0]["neighbor_id"] == 50 and out[0]["hamming"] == 0
    assert out[1]["neighbor_id"] == 51 and out[1]["hamming"] == 1


def test_bq_rescore_reorders_candidates_by_exact_cosine(spark):
    from trough_spark.operators.vectors import bq_rescore_topk

    import random

    rng = random.Random(23)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    # same sign pattern as base but scaled differently per half -> hamming 0
    # yet lower cosine than an exact copy
    samesign = [x * (0.2 if i < 32 else 2.0) for i, x in enumerate(base)]
    rows = [(0, base), (50, list(base)), (51, samesign)]
    for i in range(52, 70):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = bq_rescore_topk(
        df, "vec_id", "embedding", n_queries=1, n_candidates=10, k=3
    ).collect()
    # the exact copy outranks the same-sign-different-scale vector even
    # though both are hamming 0
    assert out[0]["neighbor_id"] == 50 and out[0]["cosine_sim"] == 1.0
    assert out[0]["hamming"] == 0 and out[1]["neighbor_id"] == 51
    assert out[1]["cosine_sim"] < 1.0
