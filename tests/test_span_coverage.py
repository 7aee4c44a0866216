"""duplicated_span_coverage: shingle-granular exact-substring dedup signal."""

import pyspark.sql.functions as F  # noqa: F401

from trough_spark.operators.dedup import duplicated_span_coverage


def _rows(df):
    return {r.id: (r.n_spans, r.dup_spans, r.dup_ppm) for r in df.collect()}


def test_exact_copy_is_fully_covered_and_unique_doc_is_clean(spark):
    ten = " ".join(f"w{i}" for i in range(10))  # 10 tokens -> 3 spans at n=8
    docs = spark.createDataFrame(
        [
            (1, ten),
            (2, ten),  # exact copy of doc 1: every span duplicated
            (3, "totally different tokens " * 3),  # 9 tokens -> 2 unique spans
            (4, "short doc"),  # 2 tokens -> 0 spans, excluded from output
        ],
        "doc_id long, text string",
    )
    got = _rows(duplicated_span_coverage(docs, "doc_id", "text", n=8, min_doc_freq=2))
    assert got == {
        1: (3, 3, 1000000),
        2: (3, 3, 1000000),
        3: (2, 0, 0),
    }


def test_partial_overlap_counts_only_shared_spans(spark):
    # doc 2 shares doc 1's first 9 tokens (2 shared 8-spans) then diverges.
    head = " ".join(f"w{i}" for i in range(9))
    docs = spark.createDataFrame(
        [(1, head + " a b c"), (2, head + " x y z")],
        "doc_id long, text string",
    )
    got = _rows(duplicated_span_coverage(docs, "doc_id", "text", n=8, min_doc_freq=2))
    # 12 tokens -> 5 spans each; spans starting at positions 1-2 are shared.
    assert got[1] == (5, 2, 400000)
    assert got[2] == (5, 2, 400000)


def test_chunk_rewrite_keeps_first_occurrence_and_drops_full_dups(spark):
    from trough_spark.operators.dedup import chunk_dedup_rewrite

    a = " ".join(f"a{i}" for i in range(6))  # one 3-token-chunk pair at chunk=3
    b = " ".join(f"b{i}" for i in range(3))
    docs = spark.createDataFrame(
        [
            (1, a),            # 2 chunks, both first occurrences
            (2, a),            # full duplicate of doc 1 -> dropped from output
            (3, a + " " + b),  # first 2 chunks lose to doc 1, last survives
            (4, b),            # loses its only chunk to doc 3 (id 3 < 4) -> dropped
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: (r.n_chunks, r.kept_chunks, r.kept_ppm)
        for r in chunk_dedup_rewrite(docs, "doc_id", "text", chunk=3).collect()
    }
    assert got == {1: (2, 2, 1000000), 3: (3, 1, 333333)}


def test_chunk_rewrite_unique_corpus_is_untouched(spark):
    from trough_spark.operators.dedup import chunk_dedup_rewrite

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(7))) for i in range(5)],
        "doc_id long, text string",
    )
    rows = chunk_dedup_rewrite(docs, "doc_id", "text", chunk=4).collect()
    assert len(rows) == 5
    assert all(r.kept_ppm == 1000000 and r.n_chunks == r.kept_chunks == 2 for r in rows)


def test_chunk_rewrite_every_distinct_chunk_survives_exactly_once(spark):
    # Invariant: the kept chunks across the whole corpus are exactly the
    # distinct chunks, each surviving once — on a seeded corpus with heavy
    # repetition across and within documents.
    import random

    from trough_spark.operators.dedup import chunk_dedup_rewrite, tokens
    import pyspark.sql.functions as F

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    chunk = 4

    out = chunk_dedup_rewrite(df, "doc_id", "text", chunk=chunk)
    kept_total = out.agg(F.sum("kept_chunks")).collect()[0][0]

    distinct_chunks = (
        df.select(F.col("doc_id"), tokens(F.col("text")).alias("toks"))
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(size(toks) / {chunk}.0) as int) - 1), "
                    f"i -> concat_ws(' ', slice(toks, i * {chunk} + 1, {chunk})))"
                )
            ).alias("ch")
        )
        .distinct()
        .count()
    )
    assert kept_total == distinct_chunks
