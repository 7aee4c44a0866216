"""Multi-probe SRP recall and incremental-dedup asymmetry properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from trough_spark.operators import dedup as D
from trough_spark.operators import similarity as S
from trough_spark.tables import load_table as T

SF = "/root/testdata/sf0.001"


def test_srp_direction_family_is_full_rank():
    """The SRP direction family must be full-rank in j: a rank-deficient
    family caps the number of reachable codes (rank 2 => at most 2*n_bits
    distinct buckets, turning the bucket join quadratic at scale — the
    round-6 bug this test pins fixed).  Mirrors srp_projection_bit's
    direction formula exactly; numpy-only, no Spark."""
    import numpy as np

    n_bits, dim = 16, 64
    dirs = np.array(
        [
            [np.sin((i + 1) * 2.39996322972865332 * (j + 1)) for i in range(dim)]
            for j in range(n_bits)
        ]
    )
    assert np.linalg.matrix_rank(dirs, tol=1e-8) == n_bits
    # and no two directions are near-parallel or near-antipodal
    g = dirs @ dirs.T
    norms = np.sqrt(np.diag(g))
    cos = g / np.outer(norms, norms)
    np.fill_diagonal(cos, 0.0)
    assert np.abs(cos).max() < 0.5, np.abs(cos).max()


def test_srp_codes_use_the_full_code_space(spark):
    """Bucket-diversity tripwire runnable in normal CI: on 500 isotropic
    vectors an 8-bit SRP code must produce far more than 2*n_bits distinct
    buckets (the degenerate family's ceiling)."""
    emb = T(spark, "/root/testdata/sf0.01", "embeddings")
    n = (
        S.srp_lsh_buckets(emb, "vec_id", "embedding", n_bits=8, dim=64)
        .select("bucket")
        .distinct()
        .count()
    )
    assert n > 2 * 8, n


def test_multiprobe_is_superset_of_plain_buckets(spark):
    emb = T(spark, SF, "embeddings")
    plain = {
        (r["id1"], r["id2"])
        for r in S.srp_bucketed_pairs(
            emb, "vec_id", "embedding", threshold=0.1, n_bits=8, dim=64
        ).collect()
    }
    multi = {
        (r["id1"], r["id2"])
        for r in S.srp_multiprobe_pairs(
            emb, "vec_id", "embedding", threshold=0.1, n_bits=8, dim=64
        ).collect()
    }
    assert plain <= multi
    # probing must actually add candidates on a real corpus
    assert len(multi) > len(plain)


def test_multiprobe_zero_hamming_equals_plain(spark):
    emb = T(spark, SF, "embeddings")
    plain = {
        (r["id1"], r["id2"], r["cosine_sim"])
        for r in S.srp_bucketed_pairs(
            emb, "vec_id", "embedding", threshold=0.1, n_bits=8, dim=64
        ).collect()
    }
    zero = {
        (r["id1"], r["id2"], r["cosine_sim"])
        for r in S.srp_multiprobe_pairs(
            emb, "vec_id", "embedding", threshold=0.1, n_bits=8, dim=64,
            probe_hamming=0,
        ).collect()
    }
    assert plain == zero


def test_incremental_candidates_are_cross_set_only(spark):
    docs = T(spark, SF, "documents")
    new = docs.filter(F.col("doc_id") >= 40)
    corpus = docs.filter(F.col("doc_id") < 40)
    out = D.incremental_lsh_candidates(new, corpus, "doc_id", "text").collect()
    for r in out:
        assert r["new_id"] >= 40 and r["corpus_id"] < 40, r


def test_incremental_agrees_with_full_lsh(spark):
    """Every incremental (new, corpus) pair must appear in the full self-join
    LSH pair set, and vice versa for cross-set pairs."""
    docs = T(spark, SF, "documents")
    sigs = D.minhash_signatures(docs, "doc_id", "text", num_perm=8, n=3)
    full = {
        (min(r["id1"], r["id2"]), max(r["id1"], r["id2"]))
        for r in D.minhash_lsh_candidates(sigs, rows_per_band=2).collect()
    }
    cross_full = {(a, b) for (a, b) in full if (a < 40) != (b < 40)}
    inc = {
        (min(r["new_id"], r["corpus_id"]), max(r["new_id"], r["corpus_id"]))
        for r in D.incremental_lsh_candidates(
            docs.filter(F.col("doc_id") >= 40),
            docs.filter(F.col("doc_id") < 40),
            "doc_id",
            "text",
        ).collect()
    }
    assert inc == cross_full
