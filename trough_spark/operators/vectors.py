"""Vector storage/training ops: int8 quantization and a deterministic
k-means (Lloyd) update step.

Both matter at 100 TB and both are built to survive the cross-engine hash
gate, which float arithmetic normally breaks two ways: (a) array columns
render differently across engines, so outputs here are FLAT (id, pos,
value) rows; (b) distributed float sums are order-dependent, so every
aggregate runs over integers — embeddings are quantized onto an exact
integer grid first, summed as BIGINTs (order-proof), and only divided once
at the end.

- ``quantize_embeddings``: symmetric per-vector int8 quantization
  (q = round(127 * x / max|x|)), the standard 4x storage/bandwidth cut for
  embedding tables; plus per-vector reconstruction error so the quality
  cost is measurable, not assumed.
- ``kmeans_update_step``: one Lloyd iteration — assign each vector to its
  nearest current centroid (exact rounded cosine, ties to lower cid), then
  recompute each centroid as the mean of its members on a 1e-6 integer
  grid.  Per-dimension sums shuffle O(N x dim) BIGINTs with full map-side
  partial aggregation; run it a handful of times offline to train the IVF
  index (`similarity.ivf_topk` consumes the centroids).  A float mean
  would be nondeterministic under Spark's aggregation order; the quantized
  mean is exact, so training is reproducible run-to-run AND engine-to-
  engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trough_spark.operators.similarity import dot, norm

QSCALE = 1_000_000  # 1e-6 grid for exact integer vector sums


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Flat int8 quantization: (id, pos, q) with q = round(127 * x / amax)
    per vector (amax = max absolute component; all-zero vectors emit q=0).
    Pure map + one posexplode — no shuffle."""
    amax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    exploded = df.select(
        F.col(id_col).alias("id"),
        amax.alias("_amax"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    q = F.when(F.col("_amax") == 0, F.lit(0)).otherwise(
        F.round(F.col("x").cast("double") * 127 / F.col("_amax"), 0)
    )
    return exploded.select(
        "id", "pos", q.cast("int").alias("q")
    )


def quantization_error(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Per-vector mean absolute reconstruction error of int8 quantization,
    on the 1e-6 grid (integer-exact aggregation, one rounded double out):
    (id, amax, mean_abs_err)."""
    amax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    exploded = df.select(
        F.col(id_col).alias("id"),
        amax.alias("_amax"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    xq = F.when(F.col("_amax") == 0, F.lit(0.0)).otherwise(
        F.round(F.col("x").cast("double") * 127 / F.col("_amax"), 0)
        * F.col("_amax")
        / 127
    )
    err_grid = F.abs(
        F.round(xq * QSCALE, 0) - F.round(F.col("x").cast("double") * QSCALE, 0)
    ).cast("bigint")
    per = exploded.select("id", F.col("_amax"), err_grid.alias("e"))
    return per.groupBy("id", "_amax").agg(
        F.sum("e").alias("_se"), F.count(F.lit(1)).alias("_n")
    ).select(
        "id",
        F.round(F.col("_amax"), 6).alias("amax"),
        F.round(F.col("_se").cast("double") / F.col("_n") / QSCALE, 6).alias(
            "mean_abs_err"
        ),
    )


def kmeans_update_step(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    dim: int | None = None,
) -> DataFrame:
    """One deterministic Lloyd iteration: exact-cosine assignment to the
    current centroids (rounded to 6, ties to lower cid), then per-dimension
    means over each cluster computed as exact BIGINT sums on the 1e-6 grid.
    Returns flat (cid, pos, val, n_members) — val on the same grid, so the
    output is engine-exact and can be re-assembled into centroid vectors
    (``F.collect_list`` sorted by pos) for the next iteration or for
    ``ivf_topk``.  Empty clusters vanish (standard Lloyd; reseed upstream
    if undesired)."""
    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).alias("_cvec"),
            norm(F.col(vec_col)).alias("_cn"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            norm(F.col(vec_col)).alias("_vn"),
        )
        .crossJoin(cents)
        .select(
            "id",
            "v",
            F.col("_cid"),
            F.round(
                dot(F.col("v"), F.col("_cvec")) / (F.col("_vn") * F.col("_cn")), 6
            ).alias("_sim"),
        )
    )
    assigned = (
        scored.select(
            "id",
            F.struct(
                (-F.col("_sim")).alias("ns"), F.col("_cid").alias("cid"), F.col("v").alias("v")
            ).alias("s"),
        )
        .groupBy("id")
        .agg(F.min("s").alias("s"))
        .select(F.col("s.cid").alias("cid"), F.col("s.v").alias("v"))
    )
    per_dim = assigned.select(
        "cid", F.posexplode(F.col("v")).alias("pos", "x")
    ).select(
        "cid",
        "pos",
        F.round(F.col("x").cast("double") * QSCALE, 0).cast("bigint").alias("xq"),
    )
    return (
        per_dim.groupBy("cid", "pos")
        .agg(F.sum("xq").alias("_sx"), F.count(F.lit(1)).alias("n_members"))
        .select(
            "cid",
            "pos",
            # FLOOR of the double quotient, not `div`: Spark's integer div
            # truncates toward zero while DuckDB's // floors — they differ
            # on negative sums.  The double quotient is safe here: operands
            # are exact integers < 2^53 and non-integral quotients sit at
            # least 1/n_members (>> 1 ulp) away from any integer.
            F.floor(F.col("_sx").cast("double") / F.col("n_members"))
            .cast("bigint")
            .alias("val_q"),
            "n_members",
        )
        .select(
            "cid",
            "pos",
            (F.col("val_q").cast("double") / QSCALE).alias("val"),
            "n_members",
        )
    )


def centroids_from_flat(flat: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Re-assemble flat (cid, pos, val) rows into centroid vectors — sort by
    pos inside an array_sort'ed struct list, so assembly is deterministic
    regardless of aggregation order."""
    return (
        flat.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("_pv"))
        .select(
            F.col("cid").alias(id_col),
            F.transform(F.col("_pv"), lambda s: s["val"]).alias(vec_col),
        )
    )


def kmeans_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    n_iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Full Lloyd training: iterate `kmeans_update_step` ``n_iters`` times
    from the given seed centroids; returns the final flat (cid, pos, val,
    n_members) table.  Every iteration is the same one-cross-join +
    one-groupBy plan; `localCheckpoint(eager)` truncates the lineage each
    round so the plan doesn't grow with iterations (the standard Spark
    iterative-algorithm pattern — without it, iteration N replans all N
    cross joins).  Results are bit-reproducible run-to-run and engine-to-
    engine because every mean is an exact BIGINT sum on the 1e-6 grid
    (see module docstring); that is what makes distributed centroid
    training auditable by a single-node oracle."""
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    cents = centroids.select(F.col(id_col), F.col(vec_col))
    flat = None
    for _ in range(n_iters):
        flat = kmeans_update_step(corpus, id_col, vec_col, cents, dim=dim)
        flat = flat.localCheckpoint(eager=True)
        cents = centroids_from_flat(flat, id_col, vec_col)
    return flat


def kmeans_oracle_sql(n_iters: int, k: int, source_cte: str = "v") -> str:
    """DuckDB CTE chain reproducing ``kmeans_train`` bit-for-bit for a seed
    of the first ``k`` vec_ids.  Expects a prior CTE ``v(vec_id, e)`` with
    double-cast embedding lists; ends with ``mean{n_iters}(cid, pos, val,
    n_members)``."""
    cos = (
        "ROUND(list_dot_product(a.e, c.ce) / "
        "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.ce, c.ce))), 6)"
    )
    parts = [
        f"cent0 AS (SELECT vec_id AS cid, e AS ce FROM {source_cte} WHERE vec_id < {k})"
    ]
    for it in range(1, n_iters + 1):
        prev = f"cent{it - 1}"
        parts.append(f"""
    assign{it} AS (
      SELECT vec_id, cid, e FROM (
        SELECT a.vec_id, c.cid, a.e,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {cos} DESC, c.cid) AS rn
        FROM {source_cte} a CROSS JOIN {prev} c
      ) WHERE rn = 1
    ),
    perdim{it} AS (
      SELECT cid, t.pos - 1 AS pos,
             CAST(ROUND(e[t.pos] * {QSCALE}, 0) AS BIGINT) AS xq
      FROM assign{it}, UNNEST(generate_series(1, len(e))) AS t(pos)
    ),
    mean{it} AS (
      SELECT cid, pos,
             CAST(FLOOR(CAST(SUM(xq) AS DOUBLE) / COUNT(*)) AS BIGINT) / {QSCALE}.0 AS val,
             COUNT(*) AS n_members
      FROM perdim{it} GROUP BY cid, pos
    ),
    cent{it} AS (
      SELECT cid, list(val ORDER BY pos) AS ce FROM mean{it} GROUP BY cid
    )""")
    return ",\n".join(parts)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): embedding-level semantic dedup.
    Assign every vector to its nearest centroid (exact rounded cosine,
    ties to lower cid — same rule as ``kmeans_update_step``), then compare
    pairs ONLY within a cluster; of any pair with cosine >= ``threshold``
    the higher id is marked dropped (keep-lowest canonical).

    Returns (id, cid, kept) for every input vector, kept as 0/1 INT.

    Scale: this is exactly why SemDeDup clusters first — the quadratic
    pair comparison is confined to one cluster (an equi-join on cid), so
    with k sized to keep clusters bounded the pair count is O(N * avg
    cluster size), never O(N^2).  Centroids broadcast; assignment is one
    map-side cross join; no driver collect.  Pairs missed across cluster
    boundaries are the algorithm's documented recall tradeoff."""
    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).alias("_cvec"),
            norm(F.col(vec_col), dim).alias("_cn"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            norm(F.col(vec_col), dim).alias("_vn"),
        )
        .crossJoin(cents)
        .select(
            "id",
            "v",
            F.col("_cid"),
            F.round(
                dot(F.col("v"), F.col("_cvec"), dim) / (F.col("_vn") * F.col("_cn")), 6
            ).alias("_sim"),
        )
    )
    assigned = (
        scored.select(
            "id",
            F.struct(
                (-F.col("_sim")).alias("ns"),
                F.col("_cid").alias("cid"),
                F.col("v").alias("v"),
            ).alias("s"),
        )
        .groupBy("id")
        .agg(F.min("s").alias("s"))
        .select("id", F.col("s.cid").alias("cid"), F.col("s.v").alias("v"))
    )
    # assigned feeds three consumers (both pair sides + the final rollup);
    # checkpoint it so the broadcast-assignment subtree runs ONCE instead of
    # being recomputed (and re-JIT-compiled) per reference — same pattern as
    # kmeans_train's per-iteration truncation.
    assigned = assigned.localCheckpoint(eager=False)
    # Within-cluster pairing is two-phase, same as cosine_pairs: the
    # O(cluster²·dim) arithmetic runs as ONE numpy matmul per cluster
    # (Arrow applyInPandas — BLAS, not 25M row-at-a-time fold evals), with
    # a 1e-6 margin so summation-order noise can't drop a true pair; the
    # few survivors are rescored with the sequential fold dot, so emitted
    # decisions stay bit-identical to the strictly sequential evaluation
    # the DuckDB oracle computes.  Group size = cluster size, which k is
    # sized to bound (SemDeDup's own contract); a pathological giant
    # cluster would compose with cosine_pairs' block scheme instead.
    import numpy as np
    import pandas as pd

    margin = 1e-6

    def cluster_candidates(pdf):
        ids = pdf["id"].to_numpy(np.int64)
        if len(ids) < 2:
            e = np.array([], dtype=np.int64)
            return pd.DataFrame({"_ia": e, "_ib": e})
        M = np.stack(pdf["v"].to_list()).astype(np.float64)
        nrm = np.sqrt((M * M).sum(axis=1))
        sims = (M @ M.T) / np.outer(nrm, nrm)
        keep = (sims >= threshold - margin) & (ids[:, None] < ids[None, :])
        r, c = np.nonzero(keep)
        return pd.DataFrame({"_ia": ids[r], "_ib": ids[c]})

    cand = assigned.groupBy("cid").applyInPandas(
        cluster_candidates, schema="_ia bigint, _ib bigint"
    )
    a = assigned.select(
        F.col("id").alias("_ia"), F.col("v").alias("_va"),
        norm(F.col("v"), dim).alias("_na"),
    )
    b = assigned.select(
        F.col("id").alias("_ib"), F.col("v").alias("_vb"),
        norm(F.col("v"), dim).alias("_nb"),
    )
    pair_sim = F.round(
        dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6
    )
    dropped = (
        cand.join(a, "_ia")
        .join(b, "_ib")
        .where(pair_sim >= F.lit(threshold))
        .select(F.col("_ib").alias("id"))
        .distinct()
        .withColumn("_drop", F.lit(1))
    )
    return assigned.join(dropped, "id", "left").select(
        "id",
        F.col("cid").cast("bigint").alias("cid"),
        F.when(F.col("_drop").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("int").alias("kept"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): m-subspace codebook compression + ADC search
# ---------------------------------------------------------------------------
#
# Why at 100 TB: a 64-dim float32 embedding is 256 bytes; its PQ code at
# m=4 subspaces is 4 bytes — a 64x cut in what an ANN scan reads.  Encoding
# is a broadcast-codebook argmin (one map-side pass); ADC search never
# touches vectors at all, just sums m table lookups per code.  This is the
# IVF-PQ pairing every billion-vector index uses (IVF confines the scan,
# PQ shrinks it).
#
# Determinism (hash-gate): distances are rounded to integer MICRO-units
# before any argmin or sum, so assignment ties and distance totals are
# integer decisions in both engines.


def pq_split(df: DataFrame, id_col: str, vec_col: str, m: int, dim: int) -> DataFrame:
    """Slice each vector into m contiguous subvectors: (id, sub_id, sv).
    Pure projection + inline explode of m static slices — no shuffle."""
    width = dim // m
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub_id"),
                F.slice(F.col(vec_col), s * width + 1, width).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col).alias("id"), F.inline(subs))


#: element grid for PQ distances: each coordinate snaps to round(x * 1000),
#: so a squared-L2 distance lands on an exact integer 1e-6 grid.  Every
#: product and partial sum is an integer < 2^53 — exact in IEEE float64 no
#: matter the summation order, hence bit-identical across engines (the
#: round-3 hash fail was summation-order ULP noise at the ROUND boundary).
PQ_GRID = 1000


def qgrid(vec: Column) -> Column:
    """Quantize a float vector onto the PQ_GRID element grid (one transform
    per ROW, evaluated in a projection before any join fans the row out —
    the per-PAIR distance then does no rounding at all)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * PQ_GRID, 0))


def _l2_micro(a, b, width: int):
    """Squared L2 distance between two ALREADY grid-quantized vectors
    (see ``qgrid``), in EXACT integer micro-units.

    Unrolled Σ(a_i-b_i)² over element_at — plain codegen'd arithmetic.
    Every coordinate is an integer ≤ ~PQ_GRID, so every product and
    partial sum is an integer < 2^53: order-independent and
    bit-reproducible in any engine doing float64 arithmetic (same pattern
    as kmeans_update_step's integer-grid means above; the oracle computes
    the algebraically identical Σqa²-2Σqaqb+Σqb² on the same grid)."""
    terms = []
    for i in range(width):
        d = F.element_at(a, i + 1) - F.element_at(b, i + 1)
        terms.append(d * d)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: DataFrame,
    m: int,
    dim: int,
) -> DataFrame:
    """Encode each vector as m codebook indices: (id, sub_id, code).

    ``codebooks`` is flat (code, sub_id, cv).  Assignment is argmin of the
    micro-quantized squared L2, ties to the lower code id.  The codebook
    table (k*m rows) broadcasts; encoding is map-side against it — the only
    shuffle is the per-(id, sub_id) argmin combine, which partial-aggregates.
    """
    width = dim // m
    # quantize once per (id, sub_id) ROW in a projection below the join —
    # the 8-way codebook fan-out then reuses the integer arrays instead of
    # re-rounding every coordinate per candidate pair
    sub = pq_split(corpus, id_col, vec_col, m, dim).select(
        "id", "sub_id", qgrid(F.col("sv")).alias("sv")
    )
    cb = F.broadcast(
        codebooks.select(
            F.col("code"), F.col("sub_id").alias("_csub"), qgrid(F.col("cv")).alias("cv")
        )
    )
    scored = sub.join(cb, sub["sub_id"] == cb["_csub"]).select(
        "id",
        "sub_id",
        F.struct(
            _l2_micro(F.col("sv"), F.col("cv"), width).alias("dmicro"),
            F.col("code").alias("code"),
        ).alias("s"),
    )
    return (
        scored.groupBy("id", "sub_id")
        .agg(F.min("s").alias("s"))
        .select("id", "sub_id", F.col("s.code").alias("code"))
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    query_sub: DataFrame,
    k: int,
    m: int,
    width: int,
) -> DataFrame:
    """Asymmetric-distance top-k: distances from a query to every encoded
    vector using only codes + a precomputed per-(sub_id, code) lookup table.

    ``query_sub`` is the query's own (sub_id, qv) slices (1 row per
    subspace, stays in-plan — no driver collect).  The distance table is
    k*m rows, broadcast; the scan is codes ⋈ table (map-side) + one integer
    groupBy sum, then TakeOrdered(k).  Total bytes read scale with CODES,
    not vectors — the entire point of PQ."""
    dtab = F.broadcast(
        codebooks.join(
            query_sub.select(F.col("sub_id").alias("_qsub"), F.col("qv")),
            codebooks["sub_id"] == F.col("_qsub"),
        ).select(
            F.col("sub_id").alias("_dsub"),
            F.col("code").alias("_dcode"),
            # k*m rows total — quantizing inline here is negligible
            _l2_micro(qgrid(F.col("qv")), qgrid(F.col("cv")), width).alias("dmicro"),
        )
    )
    return (
        codes.join(
            dtab,
            (codes["sub_id"] == F.col("_dsub")) & (codes["code"] == F.col("_dcode")),
        )
        .groupBy("id")
        .agg(F.sum("dmicro").alias("adc_dist_micro"))
        .orderBy("adc_dist_micro", "id")
        .limit(k)
    )


def ivfpq_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    query: DataFrame,
    k: int = 20,
    nprobe: int = 4,
    m: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVF+PQ search — the billion-vector index pairing, composed end to
    end: IVF confines the scan to ``nprobe`` inverted lists, PQ shrinks
    what that scan reads to m-byte codes + a broadcast distance table.

    Shape at 100 TB: centroid assignment is the one map-side pass
    ``ivf_assign`` already does (broadcast centroid matrix, BLAS batch
    scoring); codes come from ``pq_encode`` (broadcast codebook argmin) —
    both are INDEX-BUILD work amortized over every query.  Per query, the
    probed-list candidate set is an equi-join on the centroid id, the ADC
    scan reads codes only (semi-join on id), and the result is one integer
    groupBy-sum + TakeOrdered(k).  Nothing driver-side, nothing O(N).

    Determinism: probe selection uses the rounded cosine with ties to the
    lower centroid id (same rule as ``ivf_topk``); distances are the
    integer-grid ADC micro-units (see ``_l2_micro``) — both engine-exact.
    """
    from pyspark.sql.window import Window

    from trough_spark.operators.similarity import ivf_assign

    width = dim // m
    lists = ivf_assign(corpus, id_col, vec_col, centroids).select("id", "cid")
    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("_cvec"),
            norm(F.col(vec_col)).alias("_cn"),
        )
    )
    q = query.select(
        F.col(id_col).alias("_qid"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    qscored = q.crossJoin(cents).select(
        "cid",
        F.round(
            dot(F.col("_qv"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn")), 6
        ).alias("csim"),
    )
    # k_lists rows for one query — the single-partition window is fine
    wq = Window.orderBy(F.col("csim").desc(), F.col("cid"))
    probes = (
        qscored.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("cid")
    )
    cand = (
        lists.join(F.broadcast(probes), "cid")
        .join(query.select(F.col(id_col).alias("id")), "id", "left_anti")
        .select("id")
    )
    codes = pq_encode(corpus, id_col, vec_col, codebooks, m=m, dim=dim)
    cand_codes = codes.join(cand, "id", "left_semi")
    qsub = pq_split(query, id_col, vec_col, m, dim).select(
        "sub_id", F.col("sv").alias("qv")
    )
    return pq_adc_topk(cand_codes, codebooks, qsub, k=k, m=m, width=width)


def binary_quantize(
    df: DataFrame, id_col: str, vec_col: str, dim: int = 64
) -> DataFrame:
    """Sign-bit binary quantization (the 'BQ' stage of modern vector
    stores): each embedding dimension contributes one bit (1 iff the
    component is > 0), packed into two 32-bit codes held in BIGINTs —
    ``code_lo`` (dims 0..31) and ``code_hi`` (dims 32..63).  Two half
    codes instead of one 64-bit word keep every shift in positive-long
    territory (1<<63 wraps negative in two's complement; DuckDB raises on
    it, so the split is also what makes the oracle portable).

    32x smaller than float32 and distance becomes popcount — the cheapest
    possible first-stage scan at 100 TB: a billion vectors fit in 16 GB of
    codes, and the encode itself is a pure map fused into the embedding
    scan (no shuffle, no UDF; the bit-fold is a codegen'd higher-order
    ``aggregate``).

    Exactness: the only float operation is the ``> 0`` sign test (no
    arithmetic), so codes are bit-identical across engines.

    Returns (id_col, code_lo, code_hi).
    """
    if dim != 64:
        raise ValueError("binary_quantize packs exactly 64 dims (got %d)" % dim)

    def _half(offset: int):
        return F.expr(
            f"aggregate(sequence(0, 31), 0L, (acc, i) -> acc + "
            f"IF(element_at({vec_col}, i + {offset + 1}) > 0.0, "
            f"shiftleft(1L, i), 0L))"
        )

    return df.select(
        F.col(id_col),
        _half(0).alias("code_lo"),
        _half(32).alias("code_hi"),
    )


def bq_hamming_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_queries: int = 10,
    k: int = 20,
) -> DataFrame:
    """Binary-quantized top-k: Hamming distance between sign-bit codes
    approximates angular distance (the BQ scan every modern vector store
    runs before float rescoring).  Queries are the first ``n_queries`` ids
    (broadcast — queries are always the tiny side); the corpus is scanned
    ONCE over 16-byte codes; ranking is integer popcount, so the result is
    engine-exact with (hamming ASC, id ASC) as the total order.

    Scale: encode is map-only; the scan is a broadcast nested-loop over
    codes (corpus x n_queries popcounts, no shuffle of vectors); the
    per-query top-k window runs as WindowGroupLimit below the exchange —
    at 100 TB this is the fastest first-stage retrieval in the family,
    feeding the exact rescore the float queries already implement.

    Returns (query_id, neighbor_id, hamming, rnk), rnk <= k.
    """
    from pyspark.sql import Window

    codes = binary_quantize(df, id_col, vec_col)
    q = codes.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("code_lo").alias("qlo"),
        F.col("code_hi").alias("qhi"),
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (
                F.bit_count(F.expr("code_lo ^ qlo"))
                + F.bit_count(F.expr("code_hi ^ qhi"))
            ).alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def bq_rescore_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_queries: int = 10,
    n_candidates: int = 50,
    k: int = 5,
) -> DataFrame:
    """The full binary-quantization retrieval pipeline: Hamming-popcount
    first stage over 16-byte codes selects ``n_candidates`` per query,
    then ONLY those candidates are rescored with exact float cosine and
    re-ranked to ``k`` — the two-stage shape every production BQ deployment
    runs (scan cheap, rescore tiny).

    Cost model at 100 TB: stage 1 touches codes only (corpus x queries
    popcounts, no vector shuffle); stage 2 fetches ``n_candidates x
    n_queries`` float vectors by id — the expensive representation is read
    for a candidate sliver, never the corpus.  Determinism: candidate cut
    ties break on (hamming, id); rescore rounds to 6 decimals before
    ranking (house cosine rule, operators/similarity.py).

    Returns (query_id, neighbor_id, hamming, cosine_sim, rnk), rnk <= k.
    """
    from pyspark.sql import Window

    from trough_spark.operators.similarity import dot, norm

    cand = bq_hamming_topk(
        df, id_col, vec_col, n_queries=n_queries, k=n_candidates
    ).select("query_id", "neighbor_id", "hamming")
    q = df.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    c = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "cosine_sim",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "neighbor_id", "hamming", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
