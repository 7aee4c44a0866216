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


# ---------------------------------------------------------------------------
# gopher_rules / ngram_novelty (round 8)


def test_gopher_rules_flags(spark):
    from trough_spark.operators.text import gopher_rules

    good = " ".join(["the quick brown foxes and dogs of winter go home"] * 8)  # 80 words
    rows = [
        (1, good),
        (2, ""),  # empty: every n_words>0 rule fails
        (3, "# " * 60),  # symbol soup: no alpha, all hashes
        (4, "short text only"),  # under min_words
        (5, "\n".join("- bullet line %d" % i for i in range(10))),  # all bullets
        (6, good + " word… and more…" + " trailing…"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r.asDict() for r in gopher_rules(df, "doc_id", "text").collect()}
    assert out[1]["pass_gopher"] is True
    assert out[2]["rule_word_count"] is False
    assert out[2]["rule_mean_word_len"] is False
    assert out[2]["rule_alpha_words"] is False
    assert out[3]["rule_alpha_words"] is False
    assert out[3]["rule_symbol_ratio"] is False
    assert out[4]["rule_word_count"] is False
    assert out[4]["rule_stopwords"] is False
    assert out[5]["rule_bullets"] is False
    # three '…' in 83 words: 10*3 <= 83 holds -> still passes symbol rule
    assert out[6]["rule_symbol_ratio"] is True


def test_gopher_rules_map_only_plan(spark):
    from trough_spark.operators.text import gopher_rules

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_rules(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ngram_novelty_attribution(spark):
    from trough_spark.operators.text import ngram_novelty

    rows = [
        (1, "alpha beta gamma delta"),  # grams: abc, bcd (novel: both)
        (2, "alpha beta gamma delta"),  # exact dup of 1: novelty 0
        (3, "alpha beta gamma epsilon zeta"),  # shares 'alpha beta gamma'
        (4, "one two"),  # too short: 0 grams
        (5, ""),  # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r.asDict() for r in ngram_novelty(df, "doc_id", "text").collect()}
    assert out[1] == {"id": 1, "n_grams": 2, "n_novel": 2, "novelty_micro": 1000000}
    assert out[2] == {"id": 2, "n_grams": 2, "n_novel": 0, "novelty_micro": 0}
    # doc 3: grams 'alpha beta gamma' (first seen in doc 1), 'beta gamma epsilon',
    # 'gamma epsilon zeta' -> 2 of 3 novel
    assert out[3] == {"id": 3, "n_grams": 3, "n_novel": 2, "novelty_micro": 666667}
    assert out[4] == {"id": 4, "n_grams": 0, "n_novel": 0, "novelty_micro": None}
    assert out[5] == {"id": 5, "n_grams": 0, "n_novel": 0, "novelty_micro": None}


def test_ngram_novelty_repeated_gram_within_doc_counts_once(spark):
    from trough_spark.operators.text import ngram_novelty

    df = spark.createDataFrame(
        [(1, "x y z x y z x y z")], "doc_id long, text string"
    )
    out = ngram_novelty(df, "doc_id", "text").collect()[0]
    # 7 positions but only 3 DISTINCT grams: xyz, yzx, zxy
    assert out["n_grams"] == 3 and out["n_novel"] == 3


def test_token_entropy_uniform_vs_repeated(spark):
    from trough_spark.operators.text import token_entropy

    rows = [
        (1, "a b c d"),      # uniform over 4: entropy = log10(4) ≈ 0.60206
        (2, "a a a a"),      # single token: entropy 0
        (3, "a a b b"),      # uniform over 2: log10(2) ≈ 0.30103
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r.asDict() for r in token_entropy(df, "doc_id", "text").collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct"] == 4
    assert abs(out[1]["entropy_micro"] - 602060) <= 2
    assert out[2]["entropy_micro"] == 0 and out[2]["n_distinct"] == 1
    assert abs(out[3]["entropy_micro"] - 301030) <= 2
    # diversity orders as expected
    assert out[2]["entropy_micro"] < out[3]["entropy_micro"] < out[1]["entropy_micro"]


def test_bigram_logprob_boilerplate_scores_higher(spark):
    from trough_spark.operators.text import bigram_logprob

    common = "the cat sat on the mat"
    # doc 10 reuses CORPUS words in never-seen orders: every bigram has
    # cb=1 against a large history count cu(w1), so P collapses toward the
    # 0.3*unigram backoff.  (A doc of singleton words would NOT score low:
    # cb=cu=1 makes the conditional term 0.7*1/1 — word soup with a
    # private vocabulary fools a self-trained bigram LM.)
    rows = [(i, common) for i in range(1, 10)] + [
        (10, "mat the on sat cat the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r.asDict() for r in bigram_logprob(df, "doc_id", "text").collect()}
    mean = lambda r: r["sum_logprob_micro"] / r["n_bigrams"]
    assert mean(out[1]) > mean(out[10])
    assert out[1]["n_bigrams"] == 5 and out[10]["n_bigrams"] == 5
    # every logprob is negative (P < 1 whenever the corpus has > 1 bigram)
    assert all(r["sum_logprob_micro"] < 0 for r in out.values())


def test_bigram_logprob_short_docs_excluded(spark):
    from trough_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    out = bigram_logprob(df, "doc_id", "text").collect()
    assert [r["id"] for r in out] == [3]


def test_c4_filters_flags(spark):
    from trough_spark.operators import text as X

    good = (
        "This is a perfectly reasonable first sentence of prose.\n"
        "Here is another line with more than five words in it.\n"
        'And a third good line that ends with a quote."'
    )
    bad = "click here\nlorem ipsum dolor { javascript:void privacy policy"
    df = spark.createDataFrame([(1, good), (2, bad)], "doc_id bigint, text string")
    out = {r["id"]: r.asDict() for r in X.c4_filters(df, "doc_id", "text").collect()}
    g, b = out[1], out[2]
    assert g["pass_c4"] and g["n_good_lines"] == 3 and g["n_sentences"] >= 2
    assert not b["pass_c4"]
    assert not b["rule_no_lorem"] and not b["rule_no_brace"]
    assert not b["rule_no_javascript"] and not b["rule_no_policy"]
    assert not b["rule_good_lines"] and not b["rule_min_sentences"]


def test_c4_filters_map_only_plan(spark):
    from trough_spark.operators import text as X

    df = spark.createDataFrame([(1, "a.")], "doc_id bigint, text string")
    plan = X.c4_filters(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_pmi_lift_exact_and_df_gated(spark):
    from trough_spark.operators import text as X

    # "alpha beta" co-occur in all 4 docs; "alpha" alone in none ->
    # lift = n_pair * N / (df1 * df2) = 4*4/(4*4) = 1.0 -> 1_000_000 ppm.
    # "gamma" appears once (df=1 < min_df) -> never in any pair.
    docs = [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "alpha beta"),
        (4, "alpha beta delta"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = X.pmi_cooccurrence(
        df, "doc_id", "text", min_df=2, max_df_ppm=1_000_000, min_pair=2, top_k=10
    ).collect()
    got = {(r["t1"], r["t2"]): r for r in rows}
    assert ("alpha", "gamma") not in got and ("beta", "gamma") not in got
    ab = got[("alpha", "beta")]
    assert (ab["n_pair"], ab["df1"], ab["df2"], ab["n_docs"]) == (4, 4, 4, 4)
    assert ab["lift_ppm"] == 1_000_000


def test_pmi_over_represented_pair_ranks_first(spark):
    from trough_spark.operators import text as X

    # "new york" always together (2 docs of 8); "the" everywhere ->
    # lift(new,york) = 2*8/(2*2) = 4.0; lift(the,x) = 1.0
    docs = [(i, "the filler word%d" % i) for i in range(6)]
    docs += [(6, "the new york"), (7, "the new york")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = X.pmi_cooccurrence(
        df, "doc_id", "text", min_df=2, max_df_ppm=1_000_000, min_pair=2, top_k=3
    ).collect()
    assert (rows[0]["t1"], rows[0]["t2"]) == ("new", "york")
    assert rows[0]["lift_ppm"] == 4_000_000


def test_bpe_train_merges_semantics(spark):
    """Handcrafted corpus pinning the BPE rules: pair counts weight by word
    frequency, merges apply left-to-right non-overlapping ('aaaa' yields
    two 'aa' symbols, not three pairs), later rounds count MERGED symbols,
    and ties break (count DESC, left ASC, right ASC) — round 9."""
    from trough_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa ab"), (2, "aaaa ab ab")],
        "doc_id int, text string",
    )
    out = bpe_train_merges(docs, "doc_id", "text", n_merges=2)
    rows = [tuple(r) for r in out.orderBy("merge_rank").collect()]
    # 'aaaa' x3 contributes 3 adjacent (a,a) pairs each = 9; (a,b) = 3.
    assert rows[0] == (1, "a", "a", "aa", 9)
    # after the merge each 'aaaa' is [aa, aa] -> (aa,aa) x3 = 3; (a,b) x3 = 3;
    # tie at 3 breaks lexicographically: 'a','b' < 'aa','aa'
    assert rows[1] == (2, "a", "b", "ab", 3)


def test_bpe_vocab_and_encode_ids(spark):
    """Vocabulary export and id encoding (round 10): chars id-assigned in
    sorted order from 0, merges appended in rank order; encode maps the
    merged symbol sequence through the vocab map-side (zero Exchange),
    agrees with bpe_segment_counts on token counts, decodes back to the
    lowered text, and unknown symbols become unk_id."""
    from trough_spark.operators.text import (
        bpe_encode_ids,
        bpe_segment_counts,
        bpe_train_merges,
        bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "low low newer new")],
        "doc_id int, text string",
    )
    trained = bpe_train_merges(docs, "doc_id", "text", n_merges=3)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in trained.orderBy("merge_rank").collect()
    ]
    vrows = bpe_vocab(docs, "text", merges).collect()
    chars = [r for r in vrows if r["kind"] == "char"]
    mrows = [r for r in vrows if r["kind"] == "merge"]
    assert [r["symbol"] for r in chars] == sorted(r["symbol"] for r in chars)
    assert [r["token_id"] for r in vrows] == list(range(len(vrows)))
    assert [r["symbol"] for r in mrows] == [left + right for left, right in merges]
    vocab = {r["symbol"]: r["token_id"] for r in vrows}
    enc = bpe_encode_ids(docs, "doc_id", "text", merges, vocab)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    inv = {v: k for k, v in vocab.items()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    seg = {
        r["id"]: r["n_bpe_tokens"]
        for r in bpe_segment_counts(docs, "doc_id", "text", merges).collect()
    }
    for r in enc.collect():
        assert r["n_tokens"] == seg[r["id"]] == len(r["token_ids"])
        assert "".join(inv[i] for i in r["token_ids"]) == texts[r["id"]].replace(" ", "")
    # unknown symbol (char absent from a foreign vocab) -> unk_id
    foreign = {k: v for k, v in vocab.items() if k != "t"}
    unk = bpe_encode_ids(docs, "doc_id", "text", merges, foreign, unk_id=-7)
    row = {r["id"]: r["token_ids"] for r in unk.collect()}
    assert -7 in row[1] and -7 not in row[2]
