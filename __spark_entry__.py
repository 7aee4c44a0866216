"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus the
LLM-pipeline extensions), one (spark, sf_dir) -> DataFrame callable each.
``oracle_sql()`` — the DuckDB-equivalent ANSI SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-shaped multiway join) on /root/testdata/sf0.001."""
    from trough_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES["b5_join_multiway"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from trough_spark.queries import QUERIES, load_all

    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from trough_spark.queries import ORACLE, load_all

    load_all()
    return dict(ORACLE)
