"""Query inventory — the SURVEY.md §2 coverage matrix, executable.

Every entry is a (Spark DataFrame builder, DuckDB oracle SQL) pair keyed by a
stable name.  The Spark side is idiomatic DataFrame API (Catalyst plans it);
the oracle side is ANSI SQL the driver runs on DuckDB over the identical
parquet tables.  Column aliases MUST match between the two — the driver's
comparator sorts columns by name before hashing.

Determinism rules used throughout (so Spark and DuckDB hash-match bit-for-bit):
- money aggregates go through DECIMAL (exact) and are cast to DOUBLE once at
  the end — both engines produce the identical double;
- quantities are whole-number doubles, so plain SUM is exact;
- every unordered collection is sorted before concatenation;
- floating similarity scores are rounded *before* any ranking decision.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name``; ``oracle`` is the DuckDB-equivalent
    SQL (omit only for genuinely non-SQL-expressible operators — the driver
    then records a weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from trough_spark.queries import (  # noqa: F401
        bloom,
        dedup,
        extensions,
        pipeline,
        relational,
        sampling,
        similarity,
        sketches,
        streaming,
        temporal,
        text,
        trough_ops,
    )
