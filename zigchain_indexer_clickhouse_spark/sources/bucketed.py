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


# --------------------------------------------------------------------------
# 202. zorder_layout — Z-order (Morton) clustering for 2-D data skipping
# --------------------------------------------------------------------------
_ZB = 16          # bits per dimension interleaved into the z-value
_Z_BUCKET_SHIFT = 22  # bucket = z div 2^22 → 1024 buckets over 32-bit z


def _z_sql(u: str, t: str) -> str:
    """The 32-term exact bit-interleave as portable integer SQL."""
    return " + ".join(
        f"(({u} // {1 << i}) % 2) * {1 << (2 * i)}"
        f" + (({t} // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(_ZB)
    )


def _z_col(u: str, t: str):
    expr = " + ".join(
        f"(({u} div {1 << i}) % 2) * {1 << (2 * i)}L"
        f" + (({t} div {1 << i}) % 2) * {1 << (2 * i + 1)}L"
        for i in range(_ZB)
    )
    return F.expr(expr)


@register(
    "zorder_layout",
    oracle=f"""
    WITH d AS (
      SELECT (user_id * 2654435761) % {1 << _ZB} AS ub,
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % {1 << _ZB} AS tb
      FROM events),
    z AS (SELECT ub, tb, {_z_sql('ub', 'tb')} AS zv FROM d)
    SELECT CAST(zv // {1 << _Z_BUCKET_SHIFT} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ub) AS BIGINT) AS min_ub,
           CAST(MAX(ub) AS BIGINT) AS max_ub,
           CAST(MIN(tb) AS BIGINT) AS min_tb,
           CAST(MAX(tb) AS BIGINT) AS max_tb
    FROM z GROUP BY 1
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton-curve) clustering — the 2-D data-skipping layout
    (Delta OPTIMIZE ZORDER BY / ClickHouse's mortonEncode ORDER BY key):
    interleave the bits of (user_id bucket, hour bucket) into one
    integer and range-partition by it, so parquet min/max footer stats
    become tight in BOTH dimensions at once and a reader filtering on
    EITHER user or time prunes most files — a plain (user, ts) sort key
    gives tight stats only in its leading column.

    The z-value is a 32-term exact integer bit-interleave evaluated in
    whole-stage codegen (no UDF); the emitted per-bucket min/max spans
    ARE the proof of skippability: fixing the top {32 - _Z_BUCKET_SHIFT}
    z-bits fixes the top {(32 - _Z_BUCKET_SHIFT) // 2} bits of each
    dimension, so every bucket's span in each dimension is at most
    2^{_ZB - (32 - _Z_BUCKET_SHIFT) // 2} — tests/test_catalog.py
    asserts that bound. In production the same z column feeds
    ``repartitionByRange(z).sortWithinPartitions(z)`` at write time;
    this query is the layout-quality audit a lake owner runs after
    OPTIMIZE."""
    e = load(spark, sf_dir, "events")
    # Knuth multiplicative hash spreads the id dimension across the
    # full 16-bit space (raw ids occupy only the low bits, which would
    # collapse every row into one z-bucket) — the CH
    # `ORDER BY intHash32(user_id)` idiom; pruning then works on the
    # hashed bucket, which is how point-lookup predicates arrive anyway
    d = e.select(
        ((F.col("user_id") * 2654435761) % (1 << _ZB)).alias("ub"),
        (
            F.expr("unix_timestamp(ts) div 3600") % (1 << _ZB)
        ).alias("tb"),
    )
    z = d.select("ub", "tb", _z_col("ub", "tb").alias("zv"))
    return z.groupBy(
        F.expr(f"zv div {1 << _Z_BUCKET_SHIFT}").alias("bucket")
    ).agg(
        F.count("*").alias("n_events"),
        F.min("ub").alias("min_ub"),
        F.max("ub").alias("max_ub"),
        F.min("tb").alias("min_tb"),
        F.max("tb").alias("max_tb"),
    )


# --------------------------------------------------------------------------
# 203. compaction_binpack — small-file compaction with read-back audit
# --------------------------------------------------------------------------
COMPACT_FRAG_FILES = 50      # synthesized fragmentation (one write task each)
COMPACT_TARGET_ROWS = 25_000  # bin-pack target rows per output file


@register(
    "compaction_binpack",
    oracle=f"""
    SELECT CAST({COMPACT_FRAG_FILES} AS INT) AS n_files_before,
           CAST(GREATEST(1, CEIL(COUNT(*) / {COMPACT_TARGET_ROWS}.0))
                AS INT) AS n_files_after,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS checksum_cents
    FROM events
    """,
)
def compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION — the lake-maintenance pass every 100 TB
    parquet estate runs nightly (Delta OPTIMIZE / Iceberg rewrite_data_
    files; ClickHouse gets it for free from background merges, which is
    exactly the parity this operator restores): a fragmented table
    ({COMPACT_FRAG_FILES} small files, synthesized here by a
    {COMPACT_FRAG_FILES}-task write) is bin-packed down to
    ceil(rows / {COMPACT_TARGET_ROWS}) right-sized files and VERIFIED
    by a read-back audit row — row count and an integer-cents checksum
    must survive the rewrite bit-exactly, which is what the oracle
    checks against the source table (a compactor that loses or
    duplicates a row fails the driver hash, not a code review).

    Scale shape: the rewrite is one shuffle-free coalesce-style
    repartition sized from the row count (at real scale, from file
    sizes — `spark.sql.files.maxRecordsPerFile` bounds the same thing
    declaratively); the audit aggregates run distributed over the
    compacted files; only the two file-count audits are driver-side
    directory metadata (O(#files), the same listing any table format's
    manifest tracks)."""
    import math
    import os

    e = load(spark, sf_dir, "events").select("event_id", "value")
    frag_path = scratch_dir(spark, "compact_frag", sf_dir)
    comp_path = scratch_dir(spark, "compact_out", sf_dir)

    def _parquet_files(path: str) -> int:
        return sum(
            1 for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(".")
        )

    if not os.path.isdir(frag_path):
        e.repartition(COMPACT_FRAG_FILES).write.mode("overwrite").parquet(
            frag_path
        )
    frag = spark.read.parquet(frag_path)
    n_rows = frag.count()
    n_target = max(1, math.ceil(n_rows / COMPACT_TARGET_ROWS))
    frag.repartition(n_target).write.mode("overwrite").parquet(comp_path)
    back = spark.read.parquet(comp_path)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
            "checksum_cents"
        ),
    ).select(
        F.lit(_parquet_files(frag_path)).cast("int").alias("n_files_before"),
        F.lit(_parquet_files(comp_path)).cast("int").alias("n_files_after"),
        "n_rows",
        "checksum_cents",
    )
