"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB design demands:
- ``cosine_topk_bruteforce`` — exact: broadcast the (small) query set against
  the full corpus; one scan, no corpus self-shuffle.  The right baseline and
  the right verifier for any approximate index.
- ``srp_lsh_buckets`` / ``srp_topk`` — the scale path: sign-random-projection
  LSH.  Each vector maps to a small bucket key; candidate generation is an
  equi-join on bucket, so comparisons scale with bucket occupancy rather than
  corpus size (IVF-style).  The projection matrix is a deterministic function
  (sin-based), so results are reproducible anywhere with no side-channel
  state.

All arithmetic is built-in Spark array expressions (zip_with/aggregate) —
JVM-side, no Python in the row path.  Cosine scores are rounded to 6 decimals
BEFORE any ranking/threshold decision so orderings are reproducible across
engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential dot product of two float arrays (deterministic order).

    With ``dim`` known, unroll to an explicit left-associated sum of
    element_at products — plain codegen'd arithmetic, ~20x faster than the
    interpreted higher-order ``aggregate`` fold and bit-identical to it
    (the fold's 0.0 seed is an exact no-op for the first addition).
    """
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    terms = [
        F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    dim: int | None = None,
    n_blocks: int = 8,
    max_rows: int | None = 100_000,
    exact_baseline: bool = False,
    known_count: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold`` (exact).

    **Complexity bound — read before using at scale.**  This is the one
    inherently quadratic operator in the engine: O(n²/n_blocks) comparisons
    per block-pair group however good the plan, so 100× the rows is 10,000×
    the compute.  It exists as the exact baseline; every scale path around
    it (``srp_bucketed_pairs``, SRP multiprobe, IVF, IVF+PQ,
    ``semantic_dedup``, incremental ANN) is subquadratic.  To enforce the
    scoping discipline a 100 TB corpus requires, inputs larger than
    ``max_rows`` raise unless ``exact_baseline=True`` is passed explicitly —
    scope the input first (per-cluster via the ``semantic_dedup``
    assignment, per-segment, or per-LSH-bucket) or use an ANN path.

    Two phases, because the quadratic scoring is exactly where row-at-a-time
    expression evaluation dies at scale:

    1. **Blocked vectorized prefilter** — a distributed block nested-loop:
       rows hash into ``n_blocks`` blocks; every unordered block pair
       (i <= j) is one ``applyInPandas`` group whose comparisons run as a
       single numpy matmul (block i rows × block j rows, full self-matmul
       when i == j).  Each unordered row pair lands in exactly one group, so
       candidates need no dedup.  Shuffle volume is O(N · n_blocks) vectors
       and comparisons O(N²/n_blocks) per group — no driver collect, no
       corpus broadcast; size ``n_blocks`` ~ sqrt(parallelism) so groups fit
       executor memory at the target scale.  Pairs are kept if the BLAS
       score clears ``threshold - 1e-6``; the margin is ~7 orders of
       magnitude above the worst-case difference between pairwise (BLAS)
       and sequential summation over unit-scale 64-dim vectors, so no true
       pair is ever dropped.
    2. **Exact rescore** — the handful of surviving candidate pairs joins
       vectors back and recomputes the sequential-order dot product (the
       fold form — candidate counts are tiny, and the small expression
       avoids JIT-compiling a giant unrolled chain); the emitted
       ``cosine_sim`` is therefore bit-identical to a strictly sequential
       evaluation (what the DuckDB oracle computes) while the heavy
       O(N²·dim) arithmetic ran in BLAS.

    For approximate-but-cheaper candidates at corpus scale, run the same
    measure per LSH bucket instead (``srp_bucketed_pairs``).
    """
    import numpy as np
    import pandas as pd

    side = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if not exact_baseline and max_rows is not None:
        # known_count: callers that already know the input cardinality (e.g.
        # from parquet footer metadata of an unfiltered table scan) pass it
        # here so the guard costs zero Spark jobs — the guard semantics are
        # unchanged, only the count's source differs (optimization round 10)
        n = known_count if known_count is not None else side.count()
        if n > max_rows:
            raise ValueError(
                f"cosine_pairs is O(n²/n_blocks): input has {n} rows > "
                f"max_rows={max_rows}.  Scope the input (per-cluster, "
                "per-segment, or per-LSH-bucket — see srp_bucketed_pairs / "
                "semantic_dedup), raise max_rows, or pass exact_baseline=True "
                "to run the unbounded exact baseline deliberately."
            )
    margin = 1e-6
    nb = n_blocks
    with_blk = side.withColumn("blk", F.pmod(F.hash(F.col("id")), F.lit(nb)).cast("int"))
    # every row joins each block-pair group it participates in: key
    # (min(blk,j), max(blk,j)) for j in 0..nb-1 — nb distinct keys per row
    group_keys = F.array(
        *[
            F.least(F.col("blk"), F.lit(j)) * nb + F.greatest(F.col("blk"), F.lit(j))
            for j in range(nb)
        ]
    )
    replicated = with_blk.withColumn("g", F.explode(group_keys))

    def score_block_pair(pdf):
        g = int(pdf["g"].iloc[0])
        bi, bj = divmod(g, nb)
        ids = pdf["id"].to_numpy(np.int64)
        M = np.stack(pdf["v"].to_list()).astype(np.float64)
        nrm = np.sqrt((M * M).sum(axis=1))
        empty = np.array([], dtype=np.int64)
        if bi == bj:
            sims = (M @ M.T) / np.outer(nrm, nrm)
            keep = (sims >= threshold - margin) & (ids[:, None] < ids[None, :])
            r, c = np.nonzero(keep)
            return pd.DataFrame({"id1": ids[r], "id2": ids[c]})
        am = pdf["blk"].to_numpy() == bi
        if not am.any() or am.all():
            return pd.DataFrame({"id1": empty, "id2": empty})
        A, Bm = M[am], M[~am]
        idA, idB = ids[am], ids[~am]
        sims = (A @ Bm.T) / np.outer(nrm[am], nrm[~am])
        r, c = np.nonzero(sims >= threshold - margin)
        lo = np.minimum(idA[r], idB[c])
        hi = np.maximum(idA[r], idB[c])
        return pd.DataFrame({"id1": lo, "id2": hi})

    cand = replicated.groupBy("g").applyInPandas(
        score_block_pair, schema="id1 bigint, id2 bigint"
    )
    # exact rescore uses the small fold expression: candidate counts are
    # tiny, and avoiding the unrolled form skips its multi-second JIT cost
    a = side.select(F.col("id").alias("id1"), F.col("v").alias("v1")).withColumn(
        "n1", norm(F.col("v1"))
    )
    b = side.select(F.col("id").alias("id2"), F.col("v").alias("v2")).withColumn(
        "n2", norm(F.col("v2"))
    )
    return (
        cand.join(a, "id1")
        .join(b, "id2")
        .withColumn(
            "cosine_sim",
            F.round(dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id1", "id2", "cosine_sim")
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Scale: the query set is broadcast (it is small by definition of the
    API), so the corpus is scanned exactly once with no shuffle of vectors.
    Phase 1 scores every (corpus row, query) in a numpy matmul per Arrow
    batch, keeping per-partition top (k + slack) candidates per query with a
    1e-6 margin; phase 2 exact-rescores candidates sequentially and ranks on
    the rounded exact score — identical output to full exact scoring.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    # phase 1 — vectorized candidate generation: queries broadcast as a
    # numpy matrix; each corpus Arrow batch scores against ALL queries in
    # one matmul and keeps rows whose approx score could reach the top-k
    # (per-partition top (k + slack) per query; the 1e-6 margin dwarfs
    # BLAS-vs-sequential rounding, so no true neighbor is ever lost)
    qpdf = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).toPandas()
    if len(qpdf) == 0:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, cosine_sim double, rnk int"
        )
    q_ids = qpdf["query_id"].to_numpy(np.int64)
    q_mat = np.stack(qpdf["qv"].to_list()).astype(np.float64)
    q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norms))
    slack = max(2 * k, k + 8)

    def prefilter(batches):
        idsQ, matQ, normsQ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["cv"].to_list()).astype(np.float64)
            idC = pdf["neighbor_id"].to_numpy(np.int64)
            nC = np.sqrt((C * C).sum(axis=1))
            sims = (C @ matQ.T) / np.outer(nC, normsQ)  # (batch, Q)
            sims[idC[:, None] == idsQ[None, :]] = -np.inf
            out_q, out_n = [], []
            for j in range(len(idsQ)):
                col = sims[:, j]
                if len(col) > slack:
                    thresh = np.partition(col, -slack)[-slack] - 1e-6
                else:
                    thresh = -np.inf
                keep = np.nonzero(col >= thresh)[0]
                out_q.append(np.full(len(keep), idsQ[j]))
                out_n.append(idC[keep])
            yield pd.DataFrame(
                {"query_id": np.concatenate(out_q), "neighbor_id": np.concatenate(out_n)}
            )

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    cand = c.mapInPandas(prefilter, schema="query_id bigint, neighbor_id bigint")
    # phase 2 — exact sequential-order rescore of the few candidates
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).withColumn(
        "qn", norm(F.col("qv"))
    )
    cn = c.withColumn("cn", norm(F.col("cv")))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(cn, "neighbor_id")
        .withColumn(
            "cosine_sim",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def srp_projection_bit(vec: Column, j: int, dim: int) -> Column:
    """Sign of the projection of ``vec`` onto deterministic pseudo-random
    direction j, where direction[i] = sin((i+1) * GOLDEN_ANGLE * (j+1)) —
    a pure sinusoid at a per-j frequency, reproducible with no stored
    projection matrix.

    The direction family MUST be full-rank in j.  The previous form
    sin(i + j*1000) was a constant PHASE shift of one sinusoid, so every
    direction lay in span{sin i, cos i}: all projections were functions of
    a single 2-D angle and at most 2*n_bits distinct codes could ever
    occur, silently turning the bucket join quadratic at scale (caught by
    tests/test_scale_ratio.py::test_srp_multiprobe_scales_linearly — 24
    distinct buckets in a 4096 space).  Distinct FREQUENCIES give linearly
    independent sinusoids (projections = distinct Fourier components);
    golden-angle spacing keeps the frequencies mod 2*pi well-separated and
    non-antipodal for j < 32, and arguments < 5k rad keep Spark/DuckDB
    sin() bit-agreement at the level the oracles already rely on."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.sin((i + 1) * 2.39996322972865332 * (j + 1)),
            ),
            lambda x, r: x.cast("double") * r,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (proj >= 0).cast("int")


def srp_lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, n_bits: int = 8, dim: int = 64
) -> DataFrame:
    """Sign-random-projection LSH bucket per vector: an ``n_bits``-bit code.

    Scale: bucketing is a pure map — one pass, no shuffle.  Downstream ANN
    joins on the bucket key (optionally with multi-probe on neighboring
    codes), turning O(N²) similarity into per-bucket work.
    """
    code = None
    for j in range(n_bits):
        bit = srp_projection_bit(F.col(vec_col), j, dim) * (2**j)
        code = bit if code is None else code + bit
    return df.select(F.col(id_col).alias("id"), code.cast("bigint").alias("bucket"))


def srp_bucketed_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9, n_bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ANN near-dup pairs: exact cosine applied only within LSH buckets —
    the scale path's end-to-end shape.  Bucket codes are computed inline
    (one map pass), the pair join is an equi-join on the bucket key, and the
    per-pair cosine uses precomputed norms + the unrolled dot."""
    code = None
    for j in range(n_bits):
        bit = srp_projection_bit(F.col(vec_col), j, dim) * (2**j)
        code = bit if code is None else code + bit
    # fold-form norms/rescore: same JIT-avoidance as srp_multiprobe_pairs
    with_bucket = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        code.cast("bigint").alias("bucket"),
    ).withColumn("n", norm(F.col("v")))
    a = with_bucket.select(
        F.col("bucket").alias("bk"), F.col("id").alias("id1"),
        F.col("v").alias("v1"), F.col("n").alias("n1"),
    )
    b = with_bucket.select(
        F.col("bucket").alias("bk2"), F.col("id").alias("id2"),
        F.col("v").alias("v2"), F.col("n").alias("n2"),
    )
    return (
        a.join(b, (F.col("bk") == F.col("bk2")) & (F.col("id1") < F.col("id2")))
        .withColumn(
            "cosine_sim",
            F.round(dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id1", "id2", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: centroid assignment + probed exact rescore
# ---------------------------------------------------------------------------
def ivf_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    dim: int | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine → the inverted
    lists of an IVF index: (id, cid, centroid_sim, v, vn).

    Two-phase, like ``cosine_topk_bruteforce``: phase 1 scores each Arrow
    batch of vectors against the broadcast centroid matrix in ONE numpy
    matmul (the BLAS shape that also wins on a 1000-executor scan — no
    join, no shuffle, k-way scoring fused per batch) and keeps every
    centroid within 2e-6 of the batch-row maximum; phase 2 exact-rescores
    those ~1 candidate(s) per vector with the sequential fold and picks the
    argmax on the ROUNDED score with ties to the lower centroid id — so the
    assignment is bit-reproducible across engines while the hot loop stays
    vectorized.  One struct-min shuffle of ~1 row per vector.

    Centroid choice is pluggable (any deterministic selection or an
    externally trained k-means); determinism of the index build only
    requires the centroid set itself be deterministic.  ``dim`` is accepted
    for API symmetry; scoring derives width from the data.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    cpdf = centroids.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    ).toPandas()
    c_ids = cpdf["cid"].to_numpy(np.int64)
    c_mat = np.stack(cpdf["cv"].to_list()).astype(np.float64)
    c_norms = np.sqrt((c_mat * c_mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_norms))

    def prefilter(batches):
        idsC, matC, normsC = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_list()).astype(np.float64)
            nV = np.sqrt((V * V).sum(axis=1))
            sims = (V @ matC.T) / np.outer(nV, normsC)  # (batch, k)
            best = sims.max(axis=1)
            rows, cids = np.nonzero(sims >= (best[:, None] - 2e-6))
            out = pdf.iloc[rows][["id", "v"]].reset_index(drop=True)
            out["cid"] = idsC[cids]
            yield out

    src = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cand = src.mapInPandas(
        prefilter, schema=f"id bigint, v {src.schema['v'].dataType.simpleString()}, cid bigint"
    )
    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("_cvec"),
            norm(F.col(vec_col)).alias("_cn"),
        )
    )
    scored = cand.join(cents, "cid").select(
        "id",
        "v",
        "cid",
        norm(F.col("v")).alias("vn"),
        F.round(
            dot(F.col("v"), F.col("_cvec")) / (norm(F.col("v")) * F.col("_cn")), 6
        ).alias("sim"),
    )
    best = (
        scored.select(
            "id",
            F.struct(
                (-F.col("sim")).alias("ns"),
                F.col("cid").alias("cid"),
                F.col("v").alias("v"),
                F.col("vn").alias("vn"),
            ).alias("s"),
        )
        .groupBy("id")
        .agg(F.min("s").alias("s"))
    )
    return best.select(
        "id",
        F.col("s.cid").alias("cid"),
        (-F.col("s.ns")).alias("centroid_sim"),
        F.col("s.v").alias("v"),
        F.col("s.vn").alias("vn"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k neighbors per query via IVF probing: score each
    query against the (broadcast) centroids, visit only the ``nprobe``
    nearest inverted lists, and exact-rescore the candidates there.

    Scale shape: the candidate join is an equi-join on the centroid id —
    the inverted lists are the shuffle partitions, so per-query work is
    proportional to the probed lists' occupancy, never O(N).  Probe scoring
    is queries x centroids (both small) with the exact sequential fold; the
    candidate rescore reuses the norms precomputed by ``ivf_assign``.  The
    final top-k is a WindowGroupLimit per query.  Recall < 1.0 by
    construction; raise ``nprobe`` (or train better centroids) to trade
    cost for recall against the exact ``cosine_topk_bruteforce`` baseline.
    """
    from pyspark.sql import Window as W

    lists = ivf_assign(corpus, id_col, vec_col, centroids, dim=dim)
    c = F.broadcast(
        centroids.select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).alias("_cvec"),
            norm(F.col(vec_col)).alias("_cn"),
        )
    )
    qscored = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm(F.col(vec_col)).alias("qn"),
        )
        .crossJoin(c)
        .select(
            "query_id",
            "qv",
            "qn",
            F.col("_cid").alias("cid"),
            F.round(
                dot(F.col("qv"), F.col("_cvec")) / (F.col("qn") * F.col("_cn")), 6
            ).alias("csim"),
        )
    )
    wq = W.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cid"))
    probes = (
        qscored.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "qv", "qn", "cid")
    )
    cand = probes.join(lists, "cid").filter(F.col("id") != F.col("query_id"))
    rescored = cand.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(
            dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn")), 6
        ).alias("cosine_sim"),
    )
    wk = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def srp_multiprobe_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_bits: int = 8,
    dim: int = 64,
    probe_hamming: int = 1,
) -> DataFrame:
    """SRP-LSH near-dup pairs with multi-probe: besides exact bucket
    matches, one side also probes every bucket within Hamming distance
    ``probe_hamming`` of its own code (currently 1 — each of ``n_bits``
    single-bit flips).

    Multi-probe is THE standard recall lever for sign-random-projection at
    scale (Lv et al., "Multi-Probe LSH", VLDB 2007): a near-dup pair whose
    codes disagree in exactly one projection is invisible to the plain
    bucket join but caught here, at the cost of ``n_bits + 1`` probe rows
    per vector — still an equi-join on the bucket key, never a cross
    product.  Exact cosine rescoring keeps precision; candidates are
    deduplicated before scoring so a pair found via several probes scores
    once.
    """
    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming must be 0 or 1")
    code = None
    for j in range(n_bits):
        bit = srp_projection_bit(F.col(vec_col), j, dim) * (2**j)
        code = bit if code is None else code + bit
    # Candidate generation runs on (id, bucket) PAIRS ONLY — the 9-way
    # probe explosion, bucket join, and pair dedup never carry the 64-float
    # vectors (previously the probes side shuffled every vector n_bits+1
    # times and the dedup reshuffled them again).  Vectors re-attach by two
    # id equi-joins on the deduped pair list, whose sides also skip the SRP
    # code computation entirely.  Norms + rescore use the fold form
    # (dim=None): multi-probe candidate sets are large, and the giant
    # unrolled chain pays a multi-second JIT that the interpreted fold
    # avoids (measured 9.6s -> 3.4s at sf0.1, bit-identical output).
    buckets = df.select(
        F.col(id_col).alias("id"), code.cast("bigint").alias("bucket")
    )
    flips = [F.col("bucket")] + (
        [F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_bits)]
        if probe_hamming == 1
        else []
    )
    probes = buckets.select(
        F.col("id").alias("id1"), F.explode(F.array(*flips)).alias("pb")
    )
    target = buckets.select(F.col("bucket").alias("pb"), F.col("id").alias("id2"))
    cand = (
        probes.join(target, "pb")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    side = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "n", norm(F.col("v"))
    )
    a = side.select(
        F.col("id").alias("id1"), F.col("v").alias("v1"), F.col("n").alias("n1")
    )
    b = side.select(
        F.col("id").alias("id2"), F.col("v").alias("v2"), F.col("n").alias("n2")
    )
    return (
        cand.join(a, "id1")
        .join(b, "id2")
        .withColumn(
            "cosine_sim",
            F.round(dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id1", "id2", "cosine_sim")
    )


def srp_incremental_topk(
    corpus: DataFrame,
    new: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
    threshold: float = 0.0,
) -> DataFrame:
    """Daily-ingest ANN: each NEW vector retrieves its top-k nearest
    indexed CORPUS vectors through shared SRP-LSH buckets — the join is
    new x corpus, never corpus x corpus (mirror of dedup.incremental_lsh
    for embeddings).

    Scale shape: both sides bucket with the same pure-map SRP code; the
    candidate join is an equi-join on the bucket key, so per-new-vector
    work is that bucket's corpus occupancy (~N/2^n_bits), and a day's
    ingest costs O(|new| x bucket size) regardless of corpus history.
    Exact rescore on candidates (fold-form dot, rounded before ranking);
    top-k per new id via WindowGroupLimit.  A new vector whose bucket has
    no corpus members yields no rows — the documented LSH recall
    trade-off; raise n_bits' probe radius (srp_multiprobe) to buy recall.

    Returns (new_id, corpus_id, cosine_sim, rnk), rnk 1..k by (cosine
    DESC, corpus_id).
    """
    from pyspark.sql.window import Window

    def with_bucket(df, id_alias):
        code = None
        for j in range(n_bits):
            bit = srp_projection_bit(F.col(vec_col), j, dim) * (2**j)
            code = bit if code is None else code + bit
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(f"_v_{id_alias}"),
            code.cast("bigint").alias("bucket"),
        ).withColumn(f"_n_{id_alias}", norm(F.col(f"_v_{id_alias}")))

    nb = with_bucket(new, "new_id")
    cb = with_bucket(corpus, "corpus_id")
    rescored = nb.join(cb, "bucket").select(
        "new_id",
        "corpus_id",
        F.round(
            dot(F.col("_v_new_id"), F.col("_v_corpus_id"))
            / (F.col("_n_new_id") * F.col("_n_corpus_id")),
            6,
        ).alias("cosine_sim"),
    ).filter(F.col("cosine_sim") >= threshold)
    w = Window.partitionBy("new_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id")
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("new_id", "corpus_id", "cosine_sim", "rnk")
    )
