"""Similarity-search queries over the `embeddings` table, with DuckDB oracles.

Cosine arithmetic is mirrored exactly: both engines cast float→double per
element, compute a sequential dot product, and round to 6 decimals BEFORE any
threshold or ranking decision (see operators/similarity.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import similarity as S
from trough_spark.queries import query
from trough_spark.tables import load_table as T

_COS_CTE = """
    v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings)
"""

_COS_EXPR = (
    "list_dot_product(a.e, b.e) / "
    "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"
)


@query(
    "sim_cosine_pairs",
    oracle=f"""
    WITH {_COS_CTE}
    SELECT id1, id2, ROUND(sim, 6) AS cosine_sim FROM (
      SELECT a.vec_id AS id1, b.vec_id AS id2, {_COS_EXPR} AS sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    ) WHERE ROUND(sim, 6) >= 0.4
    """,
)
def sim_cosine_pairs(spark, sf_dir):
    # Exact near-dup pairs above 0.4 — the quadratic verifier.  The operator
    # enforces its own O(n²) scope bound (max_rows guard, see cosine_pairs
    # docstring); at corpus scale the same measure runs per-LSH-bucket
    # (sim_srp_buckets below) or per-cluster (sim_semantic_dedup).
    # The input is the unfiltered table, so the guard's cardinality comes
    # from the parquet footer (driver metadata) instead of a Spark count job.
    from trough_spark.tables import table_row_count

    return S.cosine_pairs(
        T(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.4, dim=64,
        known_count=table_row_count(sf_dir, "embeddings"),
    )


@query(
    "sim_ann_topk",
    oracle=f"""
    WITH {_COS_CTE},
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qe, v.e) /
                   (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(v.e, v.e))), 6)
               AS cosine_sim
      FROM v JOIN q ON v.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
)
def sim_ann_topk(spark, sf_dir):
    # Brute-force exact top-k: query set broadcast, corpus scanned once,
    # per-partition top-k below the shuffle (WindowGroupLimit).
    emb = T(spark, sf_dir, "embeddings")
    return S.cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5, dim=64
    )


@query(
    "sim_srp_buckets",
    oracle="""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    bits AS (
      SELECT vec_id, j,
             list_sum(list_transform(generate_series(0, 63),
                                     i -> e[i + 1] * sin((i + 1) * 2.39996322972865332 * (j + 1)))) AS proj
      FROM v, UNNEST(generate_series(0, 7)) AS t(j)
    )
    SELECT vec_id AS id,
           CAST(SUM(CASE WHEN proj >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
    FROM bits GROUP BY vec_id
    """,
)
def sim_srp_buckets(spark, sf_dir):
    # The ANN scale path: 8-bit sign-random-projection code per vector — a
    # pure map, no shuffle; candidate generation downstream joins on `bucket`.
    return S.srp_lsh_buckets(T(spark, sf_dir, "embeddings"), "vec_id", "embedding", n_bits=8, dim=64)


@query(
    "sim_srp_bucketed_pairs",
    oracle=f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    bits AS (
      SELECT vec_id, j,
             list_sum(list_transform(generate_series(0, 63),
                                     i -> e[i + 1] * sin((i + 1) * 2.39996322972865332 * (j + 1)))) AS proj
      FROM v, UNNEST(generate_series(0, 7)) AS t(j)
    ),
    buckets AS (
      SELECT vec_id AS id,
             CAST(SUM(CASE WHEN proj >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id
    ),
    tagged AS (SELECT b.id, b.bucket, v.e FROM buckets b JOIN v ON v.vec_id = b.id)
    SELECT id1, id2, ROUND(sim, 6) AS cosine_sim FROM (
      SELECT a.id AS id1, b.id AS id2, {_COS_EXPR} AS sim
      FROM tagged a JOIN tagged b ON a.bucket = b.bucket AND a.id < b.id
    ) WHERE ROUND(sim, 6) >= 0.2
    """,
)
def sim_srp_bucketed_pairs(spark, sf_dir):
    # End-to-end ANN scale path: exact cosine evaluated ONLY within SRP-LSH
    # buckets — pair work proportional to bucket occupancy, never N².
    return S.srp_bucketed_pairs(
        T(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=0.2, n_bits=8, dim=64,
    )


# ---------------------------------------------------------------------------
# IVF ANN: probed inverted lists + exact rescore, and its recall vs exact
# ---------------------------------------------------------------------------
def _pairsim(a_vec: str, b_vec: str) -> str:
    return (
        f"ROUND(list_dot_product({a_vec}, {b_vec}) / "
        f"(sqrt(list_dot_product({a_vec}, {a_vec})) * "
        f"sqrt(list_dot_product({b_vec}, {b_vec}))), 6)"
    )


_IVF_CTES = f"""
    {_COS_CTE},
    cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 16),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT a.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {_pairsim('a.e', 'c.ce')} DESC, c.cid) AS rn
        FROM v a CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY {_pairsim('q.qe', 'c.ce')} DESC, c.cid) AS rn
        FROM q CROSS JOIN cent c
      ) WHERE rn <= 4
    ),
    ivf_scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, {_pairsim('q.qe', 'v.e')} AS cosine_sim
      FROM probes p
      JOIN assign a ON a.cid = p.cid
      JOIN q ON q.query_id = p.query_id
      JOIN v ON v.vec_id = a.vec_id
      WHERE a.vec_id != p.query_id
    ),
    ivf_topk AS (
      SELECT query_id, neighbor_id, cosine_sim, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS rnk
        FROM ivf_scored
      ) WHERE rnk <= 5
    )
"""


@query(
    "sim_ivf_topk",
    oracle=f"""
    WITH {_IVF_CTES}
    SELECT query_id, neighbor_id, cosine_sim, rnk FROM ivf_topk
    """,
)
def sim_ivf_topk(spark, sf_dir):
    # IVF index path: 16 deterministic seed centroids, nprobe=4 lists per
    # query, exact cosine only on probed candidates.  Per-query cost is the
    # probed lists' occupancy (~nprobe/k_lists of the corpus), not O(N) —
    # the scan-everything brute force stays as the recall baseline.
    emb = T(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        "vec_id",
        "embedding",
        centroids=emb.filter(F.col("vec_id") < 16),
        k=5,
        nprobe=4,
        dim=64,
    )


@query(
    "sim_ivf_recall",
    oracle=f"""
    WITH {_IVF_CTES},
    exact_scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id, {_pairsim('q.qe', 'v.e')} AS cosine_sim
      FROM v JOIN q ON v.vec_id != q.query_id
    ),
    exact_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS rnk
        FROM exact_scored
      ) WHERE rnk <= 5
    )
    SELECT e.query_id,
           CAST(COUNT(i.neighbor_id) AS BIGINT) AS hits,
           ROUND(COUNT(i.neighbor_id) / 5.0, 3) AS recall_at_5
    FROM exact_topk e
    LEFT JOIN ivf_topk i
      ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def sim_ivf_recall(spark, sf_dir):
    # Accuracy meter for the IVF path: per-query recall@5 against the exact
    # brute-force top-5.  At scale only the (cheap) IVF side grows; the
    # exact side is a sampled audit you run on a small query set.
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = emb.filter(F.col("vec_id") < 16)
    ivf = S.ivf_topk(
        emb, queries, "vec_id", "embedding", centroids=cents, k=5, nprobe=4, dim=64
    ).select("query_id", "neighbor_id")
    exact = S.cosine_topk_bruteforce(
        emb, queries, "vec_id", "embedding", k=5, dim=64
    ).select("query_id", "neighbor_id")
    hits = exact.join(ivf.withColumn("_hit", F.lit(1)), ["query_id", "neighbor_id"], "left")
    return hits.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("hits"),
        F.round(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.lit(5.0), 3
        ).alias("recall_at_5"),
    )


# ---------------------------------------------------------------------------
# Vector ops: int8 quantization + deterministic k-means training step
# ---------------------------------------------------------------------------
@query(
    "vec_quantize_int8",
    oracle=f"""
    WITH {_COS_CTE},
    m AS (
      SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS amax FROM v
    )
    SELECT vec_id AS id, t.pos - 1 AS pos,
           CAST(CASE WHEN amax = 0 THEN 0
                     ELSE ROUND(e[t.pos] * 127 / amax, 0) END AS INT) AS q
    FROM m, UNNEST(generate_series(1, len(e))) AS t(pos)
    """,
)
def vec_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding table — the
    4x storage/bandwidth cut for vector search at scale.  Flat (id, pos, q)
    output keeps the hash gate engine-neutral (array renderings differ)."""
    from trough_spark.operators import vectors as V

    return V.quantize_embeddings(T(spark, sf_dir, "embeddings"), "vec_id", "embedding")


@query(
    "vec_quantization_error",
    oracle=f"""
    WITH {_COS_CTE},
    m AS (
      SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS amax FROM v
    ),
    per AS (
      SELECT vec_id, amax,
             CAST(abs(
               ROUND((CASE WHEN amax = 0 THEN 0.0
                           ELSE ROUND(e[t.pos] * 127 / amax, 0) * amax / 127 END)
                     * 1000000, 0)
               - ROUND(e[t.pos] * 1000000, 0)
             ) AS BIGINT) AS err
      FROM m, UNNEST(generate_series(1, len(e))) AS t(pos)
    )
    SELECT vec_id AS id, ROUND(amax, 6) AS amax,
           ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean_abs_err
    FROM per GROUP BY vec_id, amax
    """,
)
def vec_quantization_error(spark, sf_dir):
    """Mean absolute int8 reconstruction error per vector, measured on the
    1e-6 grid so the aggregate is an exact BIGINT sum — quantization quality
    is audited, not assumed."""
    from trough_spark.operators import vectors as V

    return V.quantization_error(T(spark, sf_dir, "embeddings"), "vec_id", "embedding")


@query(
    "sim_kmeans_update",
    oracle=f"""
    WITH {_COS_CTE},
    cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 16),
    assign AS (
      SELECT vec_id, cid, e FROM (
        SELECT a.vec_id, c.cid, a.e,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {{ps}} DESC, c.cid) AS rn
        FROM v a CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    per_dim AS (
      SELECT cid, t.pos - 1 AS pos,
             CAST(ROUND(e[t.pos] * 1000000, 0) AS BIGINT) AS xq
      FROM assign, UNNEST(generate_series(1, len(e))) AS t(pos)
    )
    SELECT cid, pos,
           CAST(FLOOR(CAST(SUM(xq) AS DOUBLE) / COUNT(*)) AS BIGINT) / 1000000.0 AS val,
           COUNT(*) AS n_members
    FROM per_dim GROUP BY cid, pos
    """.format(
        ps=(
            "ROUND(list_dot_product(a.e, c.ce) / "
            "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.ce, c.ce))), 6)"
        )
    ),
)
def sim_kmeans_update(spark, sf_dir):
    """One deterministic Lloyd iteration for IVF centroid training: exact
    rounded-cosine assignment, then per-dimension cluster means as exact
    BIGINT sums on a 1e-6 grid (float means would be aggregation-order-
    dependent; these reproduce bit-for-bit anywhere).  Iterate offline and
    feed the centroids to sim_ivf_topk."""
    from trough_spark.operators import vectors as V

    emb = T(spark, sf_dir, "embeddings")
    return V.kmeans_update_step(
        emb, "vec_id", "embedding", emb.filter(F.col("vec_id") < 16)
    )


@query(
    "sim_srp_multiprobe_pairs",
    oracle=f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    bits AS (
      SELECT vec_id, j,
             list_sum(list_transform(generate_series(0, 63),
                                     i -> e[i + 1] * sin((i + 1) * 2.39996322972865332 * (j + 1)))) AS proj
      FROM v, UNNEST(generate_series(0, 7)) AS t(j)
    ),
    buckets AS (
      SELECT vec_id AS id,
             CAST(SUM(CASE WHEN proj >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id
    ),
    tagged AS (SELECT b.id, b.bucket, v.e FROM buckets b JOIN v ON v.vec_id = b.id),
    probes AS (
      SELECT id, e,
             CASE WHEN t.j = 8 THEN bucket
                  ELSE xor(bucket, CAST((1 << t.j) AS BIGINT)) END AS pb
      FROM tagged, UNNEST(generate_series(0, 8)) AS t(j)
    ),
    cand AS (
      SELECT DISTINCT p.id AS id1, g.id AS id2
      FROM probes p JOIN tagged g ON g.bucket = p.pb AND p.id < g.id
    )
    SELECT id1, id2, ROUND(sim, 6) AS cosine_sim FROM (
      SELECT c.id1, c.id2, {_COS_EXPR} AS sim
      FROM cand c
      JOIN v a ON a.vec_id = c.id1
      JOIN v b ON b.vec_id = c.id2
    ) WHERE ROUND(sim, 6) >= 0.2
    """,
)
def sim_srp_multiprobe_pairs(spark, sf_dir):
    """Multi-probe SRP pairs (Hamming-1 probing): the recall lever for the
    LSH scale path — pairs whose 8-bit codes differ in one projection are
    found via single-bit-flip probes, still as an equi-join on the bucket
    key (n_bits+1 probe rows per vector, never a cross product)."""
    return S.srp_multiprobe_pairs(
        T(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=0.2, n_bits=8, dim=64,
    )


from trough_spark.operators import vectors as _V  # noqa: E402


@query(
    "sim_kmeans_train",
    oracle=f"""
    WITH {_COS_CTE},
    {_V.kmeans_oracle_sql(2, 8)}
    SELECT cid, pos, val, n_members FROM mean2
    """,
)
def sim_kmeans_train(spark, sf_dir):
    """Two full Lloyd iterations from the first-8-vectors seed — the
    offline IVF centroid-training loop, end to end.  Each iteration is one
    broadcast cross-join + one integer-grid groupBy; lineage is truncated
    per round with localCheckpoint so the plan stays constant-size however
    many iterations run.  Exact integer means make the distributed result
    reproducible against the single-node oracle."""
    emb = T(spark, sf_dir, "embeddings")
    return _V.kmeans_train(
        emb, "vec_id", "embedding", emb.filter(F.col("vec_id") < 8), n_iters=2, dim=64
    )


_SEM_COS_AB = (
    "ROUND(list_dot_product(a.e, b.e) / "
    "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6)"
)
_SEM_COS_AC = (
    "ROUND(list_dot_product(a.e, c.ce) / "
    "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.ce, c.ce))), 6)"
)


@query(
    "sim_semantic_dedup",
    oracle=f"""
    WITH {_COS_CTE},
    cent0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
    assign AS (
      SELECT vec_id, cid, e FROM (
        SELECT a.vec_id, c.cid, a.e,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {_SEM_COS_AC} DESC, c.cid) AS rn
        FROM v a CROSS JOIN cent0 c
      ) WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id AS id
      FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {_SEM_COS_AB} >= 4e-1
    )
    SELECT s.vec_id AS id, CAST(s.cid AS BIGINT) AS cid,
           CAST(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
    FROM assign s LEFT JOIN dropped d ON d.id = s.vec_id
    """,
)
def sim_semantic_dedup(spark, sf_dir):
    """SemDeDup: cluster-confined embedding dedup (assign to 8 seed
    centroids, within-cluster cosine >= 0.4 pairs, keep-lowest canonical).
    The quadratic comparison never leaves a cluster — the scale story that
    makes semantic dedup feasible on web corpora.  See
    operators/vectors.semantic_dedup."""
    emb = T(spark, sf_dir, "embeddings")
    return _V.semantic_dedup(
        emb, "vec_id", "embedding", emb.filter(F.col("vec_id") < 8),
        threshold=0.4, dim=64,
    )


# ---------------------------------------------------------------------------
# Product quantization: encode + ADC search (operators/vectors.py)
# ---------------------------------------------------------------------------
_PQ_CTE = f"""
    {_COS_CTE.strip().rstrip()},
    sub AS (
      SELECT vec_id AS id, s AS sub_id,
             list_transform(e[(s*16+1):((s+1)*16)], x -> ROUND(x * 1000, 0)) AS sv
      FROM v, UNNEST(generate_series(0, 3)) AS t(s)
    ),
    cb AS (SELECT id AS code, sub_id, sv AS cv FROM sub WHERE id < 8),
    dist AS (
      SELECT sub.id, sub.sub_id, cb.code,
             CAST(list_dot_product(sv, sv) - 2 * list_dot_product(sv, cv)
                  + list_dot_product(cv, cv) AS BIGINT) AS dmicro
      FROM sub JOIN cb USING (sub_id)
    ),
    enc AS (
      SELECT id, sub_id, code FROM (
        SELECT id, sub_id, code,
               ROW_NUMBER() OVER (PARTITION BY id, sub_id
                                  ORDER BY dmicro, code) AS rn
        FROM dist
      ) WHERE rn = 1
    )
"""


def _pq_frames(spark, sf_dir):
    from trough_spark.operators import vectors as V

    emb = T(spark, sf_dir, "embeddings")
    cb = V.pq_split(emb.filter(F.col("vec_id") < 8), "vec_id", "embedding", 4, 64).select(
        F.col("id").alias("code"), "sub_id", F.col("sv").alias("cv")
    )
    return emb, cb


@query("vec_pq_encode", oracle=f"WITH {_PQ_CTE} SELECT id, sub_id, code FROM enc")
def vec_pq_encode(spark, sf_dir):
    """PQ encoding: each 64-dim vector -> 4 codebook indices (codebook = the
    first-8 vectors' subvectors, the same deterministic seed the k-means
    queries use).  256 bytes -> 4 bytes per vector; see operators/vectors
    PQ section for the scale rationale."""
    from trough_spark.operators import vectors as V

    emb, cb = _pq_frames(spark, sf_dir)
    return V.pq_encode(emb, "vec_id", "embedding", cb, m=4, dim=64)


@query(
    "vec_pq_adc_topk",
    oracle=f"""
    WITH {_PQ_CTE},
    q AS (SELECT sub_id, sv AS qv FROM sub WHERE id = 0),
    dtab AS (
      SELECT cb.sub_id, cb.code,
             CAST(list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv)
                  + list_dot_product(cv, cv) AS BIGINT) AS dmicro
      FROM cb JOIN q USING (sub_id)
    )
    SELECT enc.id, CAST(SUM(dtab.dmicro) AS BIGINT) AS adc_dist_micro
    FROM enc JOIN dtab ON enc.sub_id = dtab.sub_id AND enc.code = dtab.code
    GROUP BY enc.id
    ORDER BY adc_dist_micro, enc.id
    LIMIT 20
    """,
)
def vec_pq_adc_topk(spark, sf_dir):
    """ADC top-20 for query vec_id=0 over PQ codes only — the scan reads
    4-byte codes plus a broadcast 32-row lookup table, never the vectors."""
    from trough_spark.operators import vectors as V

    emb, cb = _pq_frames(spark, sf_dir)
    codes = V.pq_encode(emb, "vec_id", "embedding", cb, m=4, dim=64)
    qsub = V.pq_split(
        emb.filter(F.col("vec_id") == 0), "vec_id", "embedding", 4, 64
    ).select("sub_id", F.col("sv").alias("qv"))
    return V.pq_adc_topk(codes, cb, qsub, k=20, m=4, width=16)


@query(
    "sim_matryoshka_topk",
    oracle=f"""
    WITH {_COS_CTE},
    t AS (SELECT vec_id, e[1:16] AS e16 FROM v),
    q AS (SELECT e16 AS q16 FROM t WHERE vec_id = 0)
    SELECT vec_id,
           CAST(ROUND(list_dot_product(e16, q16) /
                (sqrt(list_dot_product(e16, e16)) * sqrt(list_dot_product(q16, q16)))
                * 1000000, 0) AS BIGINT) AS cos_micro
    FROM t, q
    WHERE vec_id <> 0
    ORDER BY cos_micro DESC, vec_id
    LIMIT 20
    """,
)
def sim_matryoshka_topk(spark, sf_dir):
    """Matryoshka-truncated retrieval: top-20 by cosine on the FIRST 16 of
    64 dims.  Nested-subspace embeddings let the first-stage scan read a
    4x-smaller prefix of every vector (same bytes win as quantization,
    composable with it) and rerank survivors at full width — at 100 TB the
    candidate scan is the cost, so prefix width is the main lever.  Pure
    projection + broadcast of the single query row; micro-rounded cosine so
    the ranking is an integer decision in both engines."""
    from trough_spark.operators.similarity import dot, norm

    emb = T(spark, sf_dir, "embeddings")
    t = emb.select("vec_id", F.slice("embedding", 1, 16).alias("e16"))
    q = F.broadcast(t.filter(F.col("vec_id") == 0).select(F.col("e16").alias("q16")))
    return (
        t.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "vec_id",
            F.round(
                dot(F.col("e16"), F.col("q16"), 16)
                / (norm(F.col("e16"), 16) * norm(F.col("q16"), 16))
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("cos_micro"),
        )
        .orderBy(F.desc("cos_micro"), "vec_id")
        .limit(20)
    )


@query(
    "vec_pq_recall",
    oracle=f"""
    WITH {_PQ_CTE},
    q0 AS (SELECT e FROM v WHERE vec_id = 0),
    qsub AS (SELECT sub_id, sv AS qv FROM sub WHERE id = 0),
    dtab AS (
      SELECT cb.sub_id, cb.code,
             CAST(list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv)
                  + list_dot_product(cv, cv) AS BIGINT) AS dmicro
      FROM cb JOIN qsub USING (sub_id)
    ),
    adc AS (
      SELECT enc.id, SUM(dtab.dmicro) AS d
      FROM enc JOIN dtab ON enc.sub_id = dtab.sub_id AND enc.code = dtab.code
      WHERE enc.id <> 0
      GROUP BY enc.id ORDER BY d, enc.id LIMIT 20
    ),
    exact AS (
      SELECT vec_id FROM (
        SELECT b.vec_id,
               CAST(ROUND((list_dot_product(b.e, b.e)
                           - 2 * list_dot_product(q0.e, b.e)
                           + list_dot_product(q0.e, q0.e)) * 1000000, 0) AS BIGINT) AS d,
               ROW_NUMBER() OVER (ORDER BY
                 CAST(ROUND((list_dot_product(b.e, b.e)
                             - 2 * list_dot_product(q0.e, b.e)
                             + list_dot_product(q0.e, q0.e)) * 1000000, 0) AS BIGINT),
                 b.vec_id) AS rnk
        FROM v b, q0
        WHERE b.vec_id <> 0
      ) WHERE rnk <= 20
    )
    SELECT CAST(SUM(CASE WHEN a.id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits,
           ROUND(SUM(CASE WHEN a.id IS NULL THEN 0 ELSE 1 END) / 20.0, 3) AS recall_at_20
    FROM exact e LEFT JOIN adc a ON a.id = e.vec_id
    """,
)
def vec_pq_recall(spark, sf_dir):
    """Accuracy meter for PQ: recall@20 of the 4-byte-code ADC search
    against exact full-width L2 for query vec 0.  Same audit pattern as
    sim_ivf_recall — at scale only the cheap (code-scan) side grows; the
    exact side is a sampled audit.  Quantization quality is measured, not
    assumed."""
    from trough_spark.operators import vectors as V
    from trough_spark.operators.similarity import dot

    emb, cb = _pq_frames(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") != 0)
    codes = V.pq_encode(corpus, "vec_id", "embedding", cb, m=4, dim=64)
    qsub = V.pq_split(
        emb.filter(F.col("vec_id") == 0), "vec_id", "embedding", 4, 64
    ).select("sub_id", F.col("sv").alias("qv"))
    adc = V.pq_adc_topk(codes, cb, qsub, k=20, m=4, width=16)
    q0 = F.broadcast(emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe")))
    b, q = F.col("embedding"), F.col("qe")
    d_micro = (
        F.round((dot(b, b, 64) - 2 * dot(q, b, 64) + dot(q, q, 64)) * 1_000_000, 0)
        .cast("bigint")
        .alias("d")
    )
    exact = (
        corpus.crossJoin(q0)
        .select("vec_id", d_micro)
        .orderBy("d", "vec_id")
        .limit(20)
    )
    joined = exact.join(
        adc.select(F.col("id"), F.lit(1).alias("_hit")),
        exact["vec_id"] == F.col("id"),
        "left",
    )
    return joined.agg(
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("hits"),
        F.round(F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.lit(20.0), 3).alias(
            "recall_at_20"
        ),
    )


@query(
    "sim_incremental_ann",
    oracle="""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    bits AS (
      SELECT vec_id, j,
             list_sum(list_transform(generate_series(0, 63),
                                     i -> e[i + 1] * sin((i + 1) * 2.39996322972865332 * (j + 1)))) AS proj
      FROM v, UNNEST(generate_series(0, 7)) AS t(j)
    ),
    buckets AS (
      SELECT vec_id AS id,
             CAST(SUM(CASE WHEN proj >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id
    ),
    tagged AS (SELECT b.id, b.bucket, v.e FROM buckets b JOIN v ON v.vec_id = b.id),
    newv AS (SELECT * FROM tagged WHERE id % 20 = 0),
    corp AS (SELECT * FROM tagged WHERE id % 20 <> 0),
    scored AS (
      SELECT n.id AS new_id, c.id AS corpus_id,
             ROUND(list_dot_product(n.e, c.e) /
                   (sqrt(list_dot_product(n.e, n.e)) *
                    sqrt(list_dot_product(c.e, c.e))), 6) AS cosine_sim
      FROM newv n JOIN corp c ON n.bucket = c.bucket
    )
    SELECT new_id, corpus_id, cosine_sim, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY new_id
                  ORDER BY cosine_sim DESC, corpus_id) AS rnk
      FROM scored WHERE cosine_sim >= 0
    ) WHERE rnk <= 3
    """,
)
def sim_incremental_ann(spark, sf_dir):
    """Daily-ingest ANN: the 5% 'new' slice (vec_id % 20 = 0) retrieves
    top-3 corpus neighbors through shared SRP buckets — a new x corpus
    equi-join on the bucket key, never corpus x corpus.  The embedding twin
    of dedup_incremental: a day's ingest costs O(|new| x bucket occupancy)
    no matter how large the indexed corpus has grown.  See
    operators/similarity.srp_incremental_topk."""
    emb = T(spark, sf_dir, "embeddings")
    return S.srp_incremental_topk(
        emb.filter(F.col("vec_id") % 20 != 0),
        emb.filter(F.col("vec_id") % 20 == 0),
        "vec_id",
        "embedding",
        k=3,
        n_bits=8,
        dim=64,
        threshold=0.0,
    )


@query(
    "vec_ivfpq_search",
    oracle=f"""
    WITH {_PQ_CTE},
    icent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 16),
    iq AS (SELECT e AS qe FROM v WHERE vec_id = 0),
    iprobes AS (
      SELECT cid FROM (
        SELECT c.cid,
               ROW_NUMBER() OVER (ORDER BY {_pairsim('iq.qe', 'c.ce')} DESC, c.cid) AS rn
        FROM icent c, iq
      ) WHERE rn <= 4
    ),
    iassign AS (
      SELECT vec_id, cid FROM (
        SELECT a.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {_pairsim('a.e', 'c.ce')} DESC, c.cid) AS rn
        FROM v a CROSS JOIN icent c
      ) WHERE rn = 1
    ),
    icand AS (
      SELECT vec_id FROM iassign
      WHERE cid IN (SELECT cid FROM iprobes) AND vec_id <> 0
    ),
    q AS (SELECT sub_id, sv AS qv FROM sub WHERE id = 0),
    dtab AS (
      SELECT cb.sub_id, cb.code,
             CAST(list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv)
                  + list_dot_product(cv, cv) AS BIGINT) AS dmicro
      FROM cb JOIN q USING (sub_id)
    )
    SELECT enc.id, CAST(SUM(dtab.dmicro) AS BIGINT) AS adc_dist_micro
    FROM enc
    JOIN dtab ON enc.sub_id = dtab.sub_id AND enc.code = dtab.code
    JOIN icand ON icand.vec_id = enc.id
    GROUP BY enc.id
    ORDER BY adc_dist_micro, enc.id
    LIMIT 20
    """,
)
def vec_ivfpq_search(spark, sf_dir):
    """IVF+PQ composed — the billion-vector index pairing end to end: the
    query probes its nprobe=4 nearest of 16 IVF lists, and ONLY those
    lists' 4-byte PQ codes are scanned with integer-grid ADC distances.
    Per-query bytes = (probed fraction of corpus) x (code size), the
    multiplicative win neither piece achieves alone.  See
    operators/vectors.ivfpq_topk."""
    from trough_spark.operators import vectors as V

    emb, cbk = _pq_frames(spark, sf_dir)
    return V.ivfpq_topk(
        emb,
        "vec_id",
        "embedding",
        centroids=emb.filter(F.col("vec_id") < 16),
        codebooks=cbk,
        query=emb.filter(F.col("vec_id") == 0),
        k=20,
        nprobe=4,
        m=4,
        dim=64,
    )


@query(
    "vec_bq_hamming_topk",
    oracle="""
    WITH codes AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(range(0, 32),
               i -> CASE WHEN embedding[i + 1] > 0.0
                         THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS lo,
             CAST(list_sum(list_transform(range(0, 32),
               i -> CASE WHEN embedding[i + 33] > 0.0
                         THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS hi
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM codes WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(c.lo, q.qlo)) + bit_count(xor(c.hi, q.qhi)) AS INT)
               AS hamming
      FROM codes c JOIN q ON c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, hamming, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hamming, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 20
    """,
)
def vec_bq_hamming_topk(spark, sf_dir):
    """Binary-quantization first-stage retrieval: 64 sign bits per vector
    (two 32-bit codes), Hamming-ranked top-20 per query — 32x smaller than
    float32 and pure popcount, the cheapest billion-scale first pass
    (operators/vectors.py:bq_hamming_topk).  Engine-exact: the only float
    op is the sign test."""
    return _V.bq_hamming_topk(
        T(spark, sf_dir, "embeddings"), "vec_id", "embedding", n_queries=10, k=20
    )


@query(
    "vec_bq_rescore_topk",
    oracle=f"""
    WITH codes AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(range(0, 32),
               i -> CASE WHEN embedding[i + 1] > 0.0
                         THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS lo,
             CAST(list_sum(list_transform(range(0, 32),
               i -> CASE WHEN embedding[i + 33] > 0.0
                         THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS hi
      FROM embeddings
    ),
    qc AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM codes WHERE vec_id < 10),
    ham AS (
      SELECT qc.query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(c.lo, qc.qlo)) + bit_count(xor(c.hi, qc.qhi)) AS INT)
               AS hamming
      FROM codes c JOIN qc ON c.vec_id != qc.query_id
    ),
    cand AS (
      SELECT query_id, neighbor_id, hamming FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming, neighbor_id) AS hrnk
        FROM ham
      ) WHERE hrnk <= 50
    ),
    {_COS_CTE}
    SELECT query_id, neighbor_id, hamming, cosine_sim, rnk FROM (
      SELECT cand.query_id, cand.neighbor_id, cand.hamming,
             ROUND(list_dot_product(q.e, c.e) /
                   (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6)
               AS cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY cand.query_id
                                ORDER BY ROUND(list_dot_product(q.e, c.e) /
                                  (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6) DESC,
                                cand.neighbor_id) AS rnk
      FROM cand
      JOIN v q ON q.vec_id = cand.query_id
      JOIN v c ON c.vec_id = cand.neighbor_id
    ) WHERE rnk <= 5
    """,
)
def vec_bq_rescore_topk(spark, sf_dir):
    """Two-stage BQ retrieval end to end: Hamming candidates over 16-byte
    codes, exact float-cosine rescore of the candidate sliver only — the
    production shape where the corpus is scanned as codes and the float
    vectors are fetched for ~50 rows per query
    (operators/vectors.py:bq_rescore_topk)."""
    return _V.bq_rescore_topk(
        T(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        n_queries=10, n_candidates=50, k=5,
    )
