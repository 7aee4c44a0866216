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
