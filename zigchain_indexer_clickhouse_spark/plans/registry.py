"""Central query registry.

Every operator from SURVEY.md §2 registers itself here with

    @register("name", oracle="SELECT ... AS same_alias ...")
    def name(spark, sf_dir) -> DataFrame: ...

``oracle`` is the DuckDB-runnable ANSI SQL the driver compares against
(tables pre-registered as views). Omit it for non-SQL-expressible ops —
the driver then records a rows-only check.

Column-name discipline: the driver sorts columns by NAME before hashing
values, so every computed column must carry the same alias in the Spark
plan and the oracle SQL. Float aggregates are ROUND()ed identically on
both sides to dodge summation-order ulp drift.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register queries on import. Order = SURVEY.md §2 order.
_MODULES = (
    "zigchain_indexer_clickhouse_spark.operators.indexer_core",
    "zigchain_indexer_clickhouse_spark.operators.queue_analytics",
    "zigchain_indexer_clickhouse_spark.operators.olap",
    "zigchain_indexer_clickhouse_spark.operators.dedup",
    "zigchain_indexer_clickhouse_spark.operators.similarity",
    "zigchain_indexer_clickhouse_spark.operators.text_analysis",
    "zigchain_indexer_clickhouse_spark.operators.multimodal",
    "zigchain_indexer_clickhouse_spark.operators.curation",
    "zigchain_indexer_clickhouse_spark.operators.matviews",
    "zigchain_indexer_clickhouse_spark.operators.funnel",
    "zigchain_indexer_clickhouse_spark.operators.olap_extra",
    "zigchain_indexer_clickhouse_spark.operators.olap_shapes",
    "zigchain_indexer_clickhouse_spark.operators.orchestration",
    "zigchain_indexer_clickhouse_spark.sources.rpc_json",
    "zigchain_indexer_clickhouse_spark.sources.landing",
    "zigchain_indexer_clickhouse_spark.sources.partitioned_write",
    "zigchain_indexer_clickhouse_spark.sources.bucketed",
    "zigchain_indexer_clickhouse_spark.streaming.event_stream",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        import_module(mod)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)
