"""Bloom-filter semi-join pruning.

The 100 TB problem this solves: a selective predicate on one side of a join
(say 4% of `customer`) should shrink the OTHER side's shuffle too, but a
plain shuffle join still moves every `orders` row to the exchange before the
probe discards 96% of them.  Spark's own runtime row-group filters help at
the scan; this operator makes the idea an explicit, reusable primitive — a
few-KB bit array built with one map-side-combinable aggregation, broadcast,
and applied as a pure-map prefilter on the fact table BEFORE its shuffle.
False positives only (a stray row survives to the real join and is dropped
there); never false negatives, so the downstream join result is unchanged.

Construction is engine-portable so the DuckDB oracle reproduces it exactly:
- k index hashes per key, each the shared portable 60-bit md5 hash of
  ``key || ':' || j`` (see `operators/dedup.portable_hash`);
- the filter is ``n_words`` BIGINT words of 60 usable bits (bit 60+ never
  set, so values stay far below 2^62 — the cross-engine-safe integer range);
- words are OR-accumulated with the ``bit_or`` aggregate (partial-aggregates
  map-side in Spark; same function in DuckDB).

Reference parity note: trough itself has no bloom filters — it never joins
across segments (each query is one SQLite file, reference
`trough/read.py:33-52`).  This is a scale extension for the fan-out/global
merge upgrade (`store.read_many_df`), where cross-segment joins DO shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trough_spark.operators.dedup import portable_hash

WORD_BITS = 60  # usable bits per BIGINT word; keeps every word < 2^60


def _bit_positions(key: Column, k: int, n_words: int) -> Column:
    """Array of k global bit positions in [0, n_words*60) for ``key``.
    Hash j is the portable md5 hash of ``key || ':' || j`` — independent
    enough per j, and identically computable in DuckDB/Python."""
    total = n_words * WORD_BITS
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.pmod(
            portable_hash(F.concat(key.cast("string"), F.lit(":"), j.cast("string"))),
            F.lit(total),
        ),
    )


def _word_mask(df: DataFrame, key_col: str, k: int, n_words: int) -> DataFrame:
    """(key, j, word_idx, mask) rows — one per (key, hash fn)."""
    rows = df.select(F.col(key_col).alias("key")).select(
        "key", F.explode(_bit_positions(F.col("key"), k, n_words)).alias("pos")
    )
    return rows.select(
        "key",
        F.expr(f"pos DIV {WORD_BITS}").cast("int").alias("word_idx"),
        F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % WORD_BITS).cast("int")
        ).alias("mask"),
    )


def bloom_build(df: DataFrame, key_col: str, k: int = 4, n_words: int = 64) -> DataFrame:
    """Build the filter from the (small, already-filtered) build side.
    Returns (word_idx, word) — at most ``n_words`` rows regardless of input
    size; aggregation state is constant, combined map-side."""
    masks = _word_mask(df.where(F.col(key_col).isNotNull()), key_col, k, n_words)
    return masks.groupBy("word_idx").agg(F.bit_or("mask").alias("word"))


def bloom_words(bloom: DataFrame, n_words: int = 64) -> DataFrame:
    """Densify the sparse (word_idx, word) filter into ONE row holding an
    array<bigint> of length ``n_words`` (missing words → 0).  This single
    row is what gets broadcast to the probe side."""
    return bloom.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("_m"), i.cast("int")), F.lit(0).cast("bigint")),
        ).alias("_bloom_words")
    )


def bloom_might_contain(
    probe: DataFrame, key_col: str, bloom: DataFrame, k: int = 4, n_words: int = 64
) -> DataFrame:
    """Append boolean ``bloom_pass`` to ``probe``: true iff all k bits are
    set.  The filter is densified to a single array row and broadcast, so
    the probe check is a PURE MAP — zero shuffle on the fact side, which is
    the entire point of the prefilter.  NULL keys fail the filter (a
    semi-join would drop them anyway)."""
    words = bloom_words(bloom, n_words)
    marked = probe.crossJoin(F.broadcast(words))
    pass_ = F.forall(
        _bit_positions(F.col(key_col), k, n_words),
        lambda pos: (
            F.element_at(
                F.col("_bloom_words"), (F.floor(pos / WORD_BITS) + 1).cast("int")
            ).bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("bigint"), (pos % WORD_BITS).cast("int")
                )
            )
            != 0
        ),
    )
    return marked.withColumn("bloom_pass", F.coalesce(pass_, F.lit(False))).drop(
        "_bloom_words"
    )


def bloom_oracle_sql(
    build_sql: str, probe_sql: str, key: str, k: int = 4, n_words: int = 64
) -> str:
    """DuckDB SQL reproducing build + membership bit-for-bit.  Returns a CTE
    chain ending in ``probe_marked(key, bloom_pass)``; embed in an outer
    query.  ``build_sql``/``probe_sql`` must select one column named ``key``."""
    total = n_words * WORD_BITS
    h = (
        "CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15)) "
        "AS BIGINT) % {total}"
    ).format(total=total)
    return f"""
    build_keys AS ({build_sql}),
    build_pos AS (
      SELECT {h} AS pos
      FROM build_keys CROSS JOIN generate_series(0, {k - 1}) AS g(j)
      WHERE key IS NOT NULL
    ),
    bloom AS (
      SELECT pos // {WORD_BITS} AS word_idx,
             bit_or((CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INTEGER))) AS word
      FROM build_pos GROUP BY 1
    ),
    probe_keys AS (SELECT DISTINCT key FROM ({probe_sql}) WHERE key IS NOT NULL),
    probe_pos AS (
      SELECT key, {h} AS pos
      FROM probe_keys CROSS JOIN generate_series(0, {k - 1}) AS g(j)
    ),
    probe_marked AS (
      SELECT key,
             bool_and((COALESCE(bloom.word, 0) & (CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INTEGER))) != 0)
               AS bloom_pass
      FROM probe_pos LEFT JOIN bloom ON pos // {WORD_BITS} = bloom.word_idx
      GROUP BY key
    )
    """
