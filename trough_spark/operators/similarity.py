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


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    This is the exact quadratic form — appropriate for verification and for
    bounded partitions; at corpus scale run it per LSH bucket
    (``srp_lsh_buckets``) instead of globally.
    """
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cosine_sim", F.round(cosine(F.col("v1"), F.col("v2")), 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id1", "id2", "cosine_sim")
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Scale: the query set is broadcast (it is small by definition of the API),
    so the corpus is scanned exactly once with no shuffle of vectors; the
    final top-k per query is a WindowGroupLimit — each partition emits only k
    candidates per query before the exchange.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def srp_projection_bit(vec: Column, j: int, dim: int) -> Column:
    """Sign of the projection of ``vec`` onto deterministic pseudo-random
    direction j, where direction[i] = sin(j*1000 + i) — reproducible with no
    stored projection matrix."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: F.sin(i + j * 1000)),
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
    """ANN near-dup pairs: exact cosine applied only within LSH buckets."""
    with_bucket = df.join(
        srp_lsh_buckets(df, id_col, vec_col, n_bits, dim),
        F.col(id_col) == F.col("id"),
    ).drop("id")
    a = with_bucket.select(
        F.col("bucket").alias("bk"), F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")
    )
    b = with_bucket.select(
        F.col("bucket").alias("bk2"), F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")
    )
    return (
        a.join(b, (F.col("bk") == F.col("bk2")) & (F.col("id1") < F.col("id2")))
        .withColumn("cosine_sim", F.round(cosine(F.col("v1"), F.col("v2")), 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id1", "id2", "cosine_sim")
    )
