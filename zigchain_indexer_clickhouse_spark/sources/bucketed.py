"""Bucketed table layout (SURVEY.md §2.1b #114): the co-located
fact-fact join SURVEY §4 promises ("fact-fact joins pre-bucketed on
join key"), demonstrated end to end.

ClickHouse co-locates merges by primary-key ordering inside each part;
the Spark-native equivalent is ``bucketBy(n, key)`` at write time —
both sides of a recurring join land in the same bucket scheme, and
every later join on that key reads bucket i ⋈ bucket i with ZERO
pre-join exchange. At 100 TB this converts the nightly
lineitem⋈orders class of joins from "shuffle 100 TB twice" into a
scan-local merge — the single biggest recurring-cost lever there is.

The write costs one clustering pass, amortized over every consumer.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register
from zigchain_indexer_clickhouse_spark.sources.scratch import (
    scratch_dir,
    table_is_materialized,
)

N_BUCKETS = 8


def _bucketed_table(spark: SparkSession, sf_dir: str, src: str, key_col: str) -> DataFrame:
    """Write ``src`` bucketed+sorted by ``key_col`` (once per Spark
    application and sf_dir) and return the bucket-aware table handle.
    Path and table name embed the applicationId, so concurrent
    processes never overwrite each other's copy, and a stale metastore
    entry whose /tmp files are gone is rebuilt instead of trusted."""
    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    key = hashlib.md5(f"{sf_dir}|{src}".encode()).hexdigest()[:8]
    tbl = f"{src}_bucketed_{key}_{app}"
    path = scratch_dir(spark, f"bucketed_{src}", sf_dir)
    if not table_is_materialized(spark, tbl, path):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load(spark, sf_dir, src)
            .write.mode("overwrite")
            .option("path", path)
            .bucketBy(N_BUCKETS, key_col)
            .sortBy(key_col)
            .saveAsTable(tbl)
        )
    return spark.table(tbl)


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_items,
           ROUND(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000)
                          AS BIGINT)) / 10000.0, 4) AS revenue
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders through the bucketed layout: both facts are
    written ``bucketBy(N, orderkey)``, so the merge join consumes the
    bucket files directly — the executed plan has NO exchange below the
    join (asserted in tests/test_plan_shapes.py), only the final
    per-status agg shuffles (≤ 3 rows). The ``merge`` hint pins SMJ so
    the tiny test-scale tables don't take the broadcast path that the
    real-scale plan could never use. Revenue is quantized to 1e-4
    integers before summing (same drift-proof pattern as q9)."""
    l = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.hint("merge")
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.floor(rev * 10000).cast("long")) / 10000.0, 4
            ).alias("revenue"),
        )
    )
