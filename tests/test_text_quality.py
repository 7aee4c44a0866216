"""Corpus-statistics quality operators: boilerplate, contamination,
unigram log-prob — hand-checked on tiny corpora."""

from __future__ import annotations

import math

import pytest

from trough_spark.operators import text as X


def test_boilerplate_requires_one_threshold(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        X.boilerplate_ratio(df, "doc_id", "text")
    with pytest.raises(ValueError):
        X.boilerplate_ratio(df, "doc_id", "text", max_pct=30, min_docs=2)


def test_boilerplate_min_docs(spark):
    # shingle "a b c" appears in docs 1,2,3; "x y z" only in doc 3
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b c x y z")],
        "doc_id bigint, text string",
    )
    out = {
        r["id"]: (r["n_shingles"], r["n_boiler"], r["boilerplate_ratio"])
        for r in X.boilerplate_ratio(df, "doc_id", "text", min_docs=3).collect()
    }
    assert out[1] == (1, 1, 1.0)
    assert out[2] == (1, 1, 1.0)
    # doc 3 has shingles: "a b c","b c x","c x y","x y z" → 1 boilerplate of 4
    assert out[3] == (4, 1, 0.25)


def test_contamination_detects_containment(spark):
    bench = spark.createDataFrame([(0, "p q r s")], "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [(10, "p q r s"), (11, "u v w x y")], "doc_id bigint, text string"
    )
    out = {
        r["id"]: (r["n_overlap"], r["contamination"])
        for r in X.contamination(corpus, bench, "doc_id", "text").collect()
    }
    assert out[10] == (2, 1.0)  # both shingles of "p q r s" are in bench
    assert out[11] == (0, 0.0)


def test_unigram_logprob_uniform_corpus(spark):
    # 4 tokens, each appearing once → p = 1/4, mean log10 = log10(0.25)
    df = spark.createDataFrame([(1, "a b"), (2, "c d")], "doc_id bigint, text string")
    out = {r["id"]: r["mean_logprob"] for r in X.unigram_logprob(df, "doc_id", "text").collect()}
    expect = round(round(math.log10(0.25) * 1e6) / 1e6, 4)
    assert out == {1: expect, 2: expect}


def test_unigram_logprob_rare_tokens_score_lower(spark):
    df = spark.createDataFrame(
        [(1, "common common common common"), (2, "rare")],
        "doc_id bigint, text string",
    )
    out = {r["id"]: r["mean_logprob"] for r in X.unigram_logprob(df, "doc_id", "text").collect()}
    assert out[2] < out[1]


def test_bm25_ranks_rare_term_density_higher(spark):
    from trough_spark.operators.text import bm25_topk

    filler = " ".join(["common"] * 20)
    docs = spark.createDataFrame(
        [
            (1, "needle needle needle " + filler),
            (2, "needle " + filler),
            (3, filler),
            (4, "needle " + filler + " " + filler),  # same tf as 2, longer doc
        ],
        "doc_id long, text string",
    )
    got = bm25_topk(docs, "doc_id", "text", ["needle"], k=10).collect()
    ids = [r.id for r in got]
    assert ids[0] == 1  # highest tf wins
    assert set(ids) == {1, 2, 4}  # doc 3 has no query term
    scores = {r.id: r.score_micro for r in got}
    assert scores[2] > scores[4]  # equal tf: length normalization penalizes 4
    assert all(r.n_terms_hit == 1 for r in got)


def test_hashed_embedding_deterministic_and_count_exact(spark):
    from trough_spark.operators.text import hashed_embedding

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha"),      # one token x3 -> one dim, |w| = 3
            (2, "alpha alpha alpha"),      # identical doc -> identical vector
            (3, "beta gamma delta beta"),
        ],
        "doc_id long, text string",
    )
    rows = hashed_embedding(docs, "doc_id", "text", dims=64).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, set()).add((r.dim, r.weight))
    assert by_id[1] == by_id[2]
    assert len(by_id[1]) == 1 and abs(next(iter(by_id[1]))[1]) == 3
    # doc 3: beta x2 + gamma + delta -> per-dim weights sum of signed counts
    assert sum(abs(w) for _, w in by_id[3]) <= 4
    assert all(0 <= d < 64 for d, _ in by_id[3])
