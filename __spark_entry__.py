"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query smoke check at sf0.001.
queries()       — every implemented operator from SURVEY.md §2.
oracle_sql()    — DuckDB-equivalent SQL per query (same column aliases;
                  rounded float aggregates on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from zigchain_indexer_clickhouse_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = registry.queries()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins (see plans/registry.py)."""
    return registry.oracles()
