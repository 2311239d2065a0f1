"""OLAP analytics surface (SURVEY.md §2.2 #27-32).

The ClickHouse deployment exists to serve OLAP reporting over the
indexed chain; these queries exercise that surface: wide aggregations,
snowflake joins, per-group top-N, sessionization, and time-bucket
rollups (the hypertable-rollup analog).

Scale design: every dimension join is broadcast (dims ≪ 32 MB even at
sf 100); fact-side aggregations are partial (map-side combine) before
their single shuffle; top-Ns run as windowed rank or
TakeOrderedAndProject, never a global sort of the fact table.

Float discipline: aggregates are ROUND()ed identically in Spark and the
DuckDB oracle so summation-order ulp drift can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register


# --------------------------------------------------------------------------
# 27. q1_pricing_summary — TPC-H Q1 shape (flagship)
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,6))), 2)
                 AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 2)
                 AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                 * (1 + l_tax) AS DECIMAL(38,6))), 2) AS DOUBLE)
             AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: one wide aggregation with derived
    expressions — the canonical ClickHouse-style scan+agg. Single
    shuffle, partial aggregation map-side, filter pushed to parquet.

    Sums accumulate in DECIMAL(38,6), not double: per-row products are
    identical IEEE doubles on both engines, but double SUMMATION is
    order-dependent and at 6M rows the engines' different partial-agg
    orders drifted sum_charge by 0.01 after rounding (caught by the
    r11 sf1.0 sweep). Exact decimal addition is order-independent, so
    the aggregate is bit-stable at every scale; the one-time
    double→decimal quantization of the same input bits rounds
    identically on both sides."""
    l = load(spark, sf_dir, "lineitem")
    dec = "decimal(38,6)"
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    sq = F.sum(F.col("l_quantity").cast(dec))
    sbp = F.sum(F.col("l_extendedprice").cast(dec))
    sdisc = F.sum(F.col("l_discount").cast(dec))
    n = F.count("*")

    def r2(c):
        # round ON THE DECIMAL, then cast: rounding the double instead
        # diverges at exact half-cent ties — Spark's double round goes
        # through the shortest decimal string (HALF_UP on ".865"),
        # DuckDB rounds the binary value (slightly below the tie), a
        # 0.01 disagreement the sf1.0 sweep caught on q7
        return F.round(c, 2).cast("double")

    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(sq).alias("sum_qty"),
            r2(sbp).alias("sum_base_price"),
            r2(F.sum(disc_price.cast(dec))).alias("sum_disc_price"),
            r2(F.sum(charge.cast(dec))).alias("sum_charge"),
            F.round(sq.cast("double") / n, 4).alias("avg_qty"),
            F.round(sbp.cast("double") / n, 4).alias("avg_price"),
            F.round(sdisc.cast("double") / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# 28. q3_top_unshipped — join + agg + topN (TPC-H Q3 shape)
# --------------------------------------------------------------------------
@register(
    "q3_top_unshipped",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top unshipped orders by revenue: 3-way join, aggregate, top-N.
    customer broadcasts into orders, the filtered orders side broadcasts
    into lineitem (AQE converts post-filter), and the top-10 runs as
    TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            # decimal accumulation: order-independent exact sums (the
            # r11 half-cent-tie class, see q1)
            F.round(F.sum((F.col("l_extendedprice")
                           * (1 - F.col("l_discount")))
                          .cast("decimal(38,6)")), 2)
            .cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# 29. q5_local_volume — snowflake join (TPC-H Q5 shape)
# --------------------------------------------------------------------------
@register(
    "q5_local_volume",
    oracle="""
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-table snowflake. All dims broadcast; the
    only shuffles are lineitem⋈orders (on orderkey) and the final
    groupBy — the minimal-shuffle plan for this shape."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum((F.col("l_extendedprice")
                           * (1 - F.col("l_discount")))
                          .cast("decimal(38,6)")), 2)
            .cast("double").alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# 30. top_users_by_value — per-group top-N
# --------------------------------------------------------------------------
@register(
    "top_users_by_value",
    oracle="""
    SELECT event_type, user_id, total_value, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT event_type, user_id,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2)
               AS DOUBLE) AS total_value,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2)
                             AS DOUBLE) DESC, user_id) AS rnk
      FROM events GROUP BY event_type, user_id
    ) WHERE rnk <= 3
    """,
)
def top_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N (ClickHouse `LIMIT n BY group` analog): aggregate
    then windowed rank — shuffles on the group key only, never a global
    sort."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy("event_type", "user_id").agg(
        F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
        .cast("double").alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("total_value").desc(), "user_id")
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "user_id", "total_value", "rnk")
    )


# --------------------------------------------------------------------------
# 31. sessionize — gap-based sessionization
# --------------------------------------------------------------------------
@register(
    "sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2)
             AS DOUBLE) AS session_value,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle gap): lag + running sum of
    session-start flags, then per-session rollup. One shuffle on
    user_id serves both windows and the final groupBy."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")) > 1800),
        1,
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("new_s", new_s)
        .withColumn("session_id", F.sum("new_s").over(cum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
            .cast("double").alias("session_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# --------------------------------------------------------------------------
# 32. time_bucket_rollup — hypertable rollup analog
# --------------------------------------------------------------------------
@register(
    "time_bucket_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2)
             AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour event rollup (the reference's toYYYYMM partition rollups /
    hypertable-style downsampling). date_trunc groupBy — on a
    date-partitioned layout this aggregates partition-locally."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
        .cast("double").alias("total_value"),
    )
