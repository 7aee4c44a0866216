"""Differential oracle: every registered query must match its DuckDB SQL on
the same parquet tables — the same comparison the driver's correctness gate
performs (row count + schema + order-insensitive value hash).

Run against sf0.001 by default (fast); set TROUGH_TEST_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's t2 configuration.
"""

from __future__ import annotations

import decimal
import math
import os

import duckdb
import pytest

from tests.conftest import SF_ORACLE
from trough_spark.queries import ORACLE, QUERIES, load_all

load_all()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(v):
    """Normalize a cell for order-insensitive comparison.

    Ints and floats canonicalize to DISTINCT strings ("i123" vs "f123"): the
    driver's hasher distinguishes them (pandas dtype goes into the hash), and
    collapsing them here is exactly how the round-3/4 HUGEINT oracle bug hid
    from this suite while failing the driver.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "i" + str(int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return "f" + f"{v:.10g}"
    if isinstance(v, int):
        return "i" + str(v)
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, name):
    sf_dir = SF_ORACLE
    sdf = QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    con = _duck(sf_dir)
    cur = con.execute(ORACLE[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:5]
    assert sset == dset, (
        f"{name}: value mismatch at sorted rows {mism}; "
        f"spark={[sset[i] for i in mism]} oracle={[dset[i] for i in mism]}"
    )


def test_no_hugeint_oracle_columns():
    """Tripwire: DuckDB types a raw SUM(BIGINT) as HUGEINT (INT128), which
    the driver's hasher canonicalizes differently from Spark's BIGINT even
    when values are bit-identical (the entire round-4 red set).  Every
    oracle's result schema must therefore be HUGEINT-free — wrap sums in
    CAST(... AS BIGINT)."""
    con = _duck(SF_ORACLE)
    bad = {}
    for name, sql in sorted(ORACLE.items()):
        rel = con.sql(sql)
        huge = [
            c
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if huge:
            bad[name] = huge
    assert not bad, f"oracles with HUGEINT output columns: {bad}"


def test_all_queries_have_entries():
    assert QUERIES, "no queries registered"
    missing = set(ORACLE) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


def test_jaccard_size_pruning_lossless(spark):
    """prune_by_size must be result-identical to the unpruned form (it only
    removes mathematically-impossible pairs)."""
    from trough_spark.operators.dedup import ngram_jaccard_pairs
    from trough_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = {(r["id1"], r["id2"]): r["jaccard"]
            for r in ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.3).collect()}
    pruned = {(r["id1"], r["id2"]): r["jaccard"]
              for r in ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.3,
                                           prune_by_size=True).collect()}
    assert base == pruned and base


def test_lsh_bucket_cap_off_is_lossless(spark):
    """max_bucket_size=None (default) and an above-occupancy cap both yield
    the exact uncapped pair set; a tiny cap yields a strict subset."""
    from trough_spark.operators.dedup import minhash_lsh_candidates, minhash_signatures
    from trough_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    sigs = minhash_signatures(d, "doc_id", "text").cache()
    base = {(r["id1"], r["id2"]) for r in minhash_lsh_candidates(sigs).collect()}
    huge = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_candidates(sigs, max_bucket_size=10**9).collect()
    }
    capped = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_candidates(sigs, max_bucket_size=2).collect()
    }
    sigs.unpersist()
    assert base and huge == base
    assert capped <= base


def test_minhash_wide_path_equals_long_path(spark):
    """The wide (vector) LSH path must produce the EXACT candidate pair set
    and per-permutation signature values of the long (relational) path —
    same permutations, same band hashes, one less shuffle."""
    from trough_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_candidates_wide,
        minhash_signature_vector,
        minhash_signatures,
    )
    from trough_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    long_sigs = minhash_signatures(d, "doc_id", "text", num_perm=8)
    wide_sigs = minhash_signature_vector(d, "doc_id", "text", num_perm=8)
    long_map = {}
    for r in long_sigs.collect():
        long_map.setdefault(r["id"], {})[r["perm"]] = r["minhash"]
    wide_map = {r["id"]: list(r["sig"]) for r in wide_sigs.collect()}
    assert {i: [m[p] for p in range(8)] for i, m in long_map.items()} == wide_map

    long_pairs = {(r["id1"], r["id2"]) for r in minhash_lsh_candidates(long_sigs).collect()}
    wide_pairs = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_candidates_wide(wide_sigs, num_perm=8).collect()
    }
    assert long_pairs == wide_pairs and long_pairs
    # capped variants agree too
    lc = {(r["id1"], r["id2"]) for r in minhash_lsh_candidates(long_sigs, max_bucket_size=2).collect()}
    wc = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_candidates_wide(wide_sigs, num_perm=8, max_bucket_size=2).collect()
    }
    assert lc == wc


def test_minhash_estimate_wide_equals_long(spark):
    from trough_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_jaccard_estimate_wide,
        minhash_lsh_candidates,
        minhash_signature_vector,
        minhash_signatures,
    )
    from trough_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    sigs = minhash_signatures(d, "doc_id", "text", num_perm=8)
    cand = minhash_lsh_candidates(sigs).cache()
    try:
        long_est = {
            (r["id1"], r["id2"]): (r["n_agree"], r["est_jaccard"])
            for r in minhash_jaccard_estimate(sigs, cand, num_perm=8).collect()
        }
        wide_est = {
            (r["id1"], r["id2"]): (r["n_agree"], r["est_jaccard"])
            for r in minhash_jaccard_estimate_wide(
                minhash_signature_vector(d, "doc_id", "text", num_perm=8), cand, num_perm=8
            ).collect()
        }
    finally:
        cand.unpersist()
    assert long_est == wide_est and long_est
