"""ClickHouse GROUP BY modifiers and merge-engine semantics
(SURVEY.md §2.1b/#124-127): WITH ROLLUP / WITH CUBE / WITH TOTALS
subtotal queries, CollapsingMergeTree sign-collapse, and
AggregatingMergeTree partial-state re-aggregation.

The reference stores its tables in ClickHouse MergeTree engines
(init_clickhouse.js): ReplacingMergeTree is modeled by
``replacing_dedup``/``index_state_latest`` (indexer_core.py) and MV
maintenance by matviews.py. This module covers the remaining engine/
modifier semantics a ClickHouse user reaches for:

- ``GROUP BY ... WITH ROLLUP / WITH CUBE / WITH TOTALS`` → Spark
  ``rollup()`` / ``cube()`` with ``grouping()`` markers. Catalyst plans
  these as ONE Expand + one aggregate — subtotals cost one pass, not
  one scan per grouping set.
- CollapsingMergeTree: state rows carry sign=+1/-1; the engine's
  background merge cancels +1/-1 pairs, leaving current state. Here
  the collapse is a groupBy over the row key summing signs — the exact
  read-time semantics of ``SELECT ... FINAL``.
- AggregatingMergeTree: partial aggregate states per coarse partition
  merged at read time. Mergeable states (count/sum/min/max) re-aggregate
  associatively — the property that lets a 100 TB table keep daily
  partials and answer monthly questions without touching raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register


# --------------------------------------------------------------------------
# 124. rollup_totals — GROUP BY status, priority WITH ROLLUP (incl. TOTALS)
# --------------------------------------------------------------------------
@register(
    "rollup_totals",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE o_orderstatus END AS status,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS INT) AS grouping_lvl,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2)
             AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY (status, priority) WITH ROLLUP`` — per-(status,
    priority) rows, per-status subtotals, and the grand-total row that
    ClickHouse's WITH TOTALS emits, all in one aggregate. The rolled-up
    dimensions read 'ALL' (disambiguated from a real NULL by the
    grouping level, as ClickHouse's ``grouping()`` does).

    Plan: one Expand (3 grouping sets) feeding ONE partial+final
    aggregate — rows triple on the map side but combine before the
    exchange; never three scans. Scales like any single groupBy."""
    o = load(spark, sf_dir, "orders")
    lvl = (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).cast(
        "int"
    )
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            # grouping()/grouping_id() only exist inside the aggregate —
            # materialize the level here, branch on the column after
            lvl.alias("grouping_lvl"),
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2)
            .cast("double").alias("sum_price"),
        )
        .select(
            F.when(F.col("grouping_lvl") >= 2, "ALL")
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.when(F.col("grouping_lvl") % 2 == 1, "ALL")
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            "grouping_lvl",
            "n_orders",
            "sum_price",
        )
    )


# --------------------------------------------------------------------------
# 125. cube_cohorts — GROUP BY (event_type, cohort) WITH CUBE
# --------------------------------------------------------------------------
@register(
    "cube_cohorts",
    oracle="""
    WITH e AS (
      SELECT event_type, user_id, user_id % 10 AS cohort
      FROM events
    )
    SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
                ELSE event_type END AS event_type,
           CAST(CASE WHEN GROUPING(cohort) = 1 THEN -1
                ELSE cohort END AS BIGINT) AS cohort,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM e
    GROUP BY CUBE(event_type, cohort)
    """,
)
def cube_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH CUBE`` over (event_type, user cohort): all four grouping
    sets — per cell, per type, per cohort, grand total — in one pass,
    with a COUNT(DISTINCT user) inside. Rolled-up cohort reads -1
    (cohorts are 0-9), rolled-up type reads 'ALL'.

    Plan: Expand(4 sets) → distinct-expand → two-phase agg. The
    distinct-aggregate doubles the expansion, but every row is (type,
    small-int, user_id) — the payload is 3 narrow columns regardless of
    corpus width. Scales as a 4x-row single aggregate."""
    e = load(spark, sf_dir, "events").select(
        "event_type", "user_id", (F.col("user_id") % 10).alias("cohort")
    )
    return (
        e.cube("event_type", "cohort")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            F.when(F.col("gid") >= 2, "ALL")
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            F.when(F.col("gid") % 2 == 1, F.lit(-1))
            .otherwise(F.col("cohort"))
            .cast("long")
            .alias("cohort"),
            "n_events",
            "n_users",
        )
    )


# --------------------------------------------------------------------------
# 126. collapsing_merge — CollapsingMergeTree sign-collapse (FINAL read)
# --------------------------------------------------------------------------
@register(
    "collapsing_merge",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             lead(event_id) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_id
      FROM events
    ),
    log AS (
      SELECT user_id, event_id, ts, value, 1 AS sign FROM ordered
      UNION ALL
      SELECT user_id, event_id, ts, value, -1 AS sign
      FROM ordered WHERE next_id IS NOT NULL
    )
    SELECT user_id, CAST(event_id AS BIGINT) AS event_id, ts, value
    FROM log
    GROUP BY user_id, event_id, ts, value
    HAVING SUM(sign) > 0
    """,
)
def collapsing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree ``FINAL``: each state change writes a +1 row
    and a -1 cancel of the previous state; the collapse keeps rows whose
    signs don't cancel — exactly each user's latest event here. The
    sign-stream is synthesized from events (every non-final event gets a
    cancel), then collapsed by the engine-agnostic rule: groupBy the
    full row, keep SUM(sign) > 0.

    Plan: one shuffle on user_id for the lead() window (cancel
    generation), one map-side-combinable agg on the row key for the
    collapse. At 100 TB the collapse agg is the same shape ClickHouse's
    background merge runs per part — associative, partition-local
    first. No driver state, no global sort."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.withColumn("next_id", F.lead("event_id").over(w))
    plus = ordered.select(
        "user_id", "event_id", "ts", "value", F.lit(1).alias("sign")
    )
    minus = ordered.filter(F.col("next_id").isNotNull()).select(
        "user_id", "event_id", "ts", "value", F.lit(-1).alias("sign")
    )
    return (
        plus.unionAll(minus)
        .groupBy("user_id", F.col("event_id").cast("long").alias("event_id"),
                 "ts", "value")
        .agg(F.sum("sign").alias("sign_sum"))
        .filter(F.col("sign_sum") > 0)
        .select("user_id", "event_id", "ts", "value")
    )


# --------------------------------------------------------------------------
# 127. agg_states_merge — AggregatingMergeTree partial-state re-aggregation
# --------------------------------------------------------------------------
@register(
    "agg_states_merge",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             strftime(ts, '%Y-%m') AS month,
             COUNT(*) AS cnt, SUM(CAST(value AS DECIMAL(38,6))) AS sum_v,
             MIN(value) AS min_v, MAX(value) AS max_v
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, month,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(sum_v), 2) AS DOUBLE) AS sum_value,
           ROUND(MIN(min_v), 4) AS min_value,
           ROUND(MAX(max_v), 4) AS max_value
    FROM daily GROUP BY event_type, month
    """,
)
def agg_states_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree read path: daily partial states
    (count/sum/min/max per (event_type, day)) merged into monthly
    answers WITHOUT re-reading raw events — the merge is a second
    aggregate over the states, valid because these states are
    associative and commutative (ClickHouse's -State / -Merge
    combinator pair).

    The oracle runs the identical two-level plan, and
    tests/test_engine_modifiers.py asserts the merged result equals the
    direct single-level aggregate — the mergeability property itself.

    Plan: first agg shuffles once on (type, day); the merge agg's input
    is |days|x|types| rows — negligible at any scale. This two-level
    shape is why a 100 TB events table answers month queries in
    milliseconds: the big shuffle happened at ingest, once."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.date_format("ts", "yyyy-MM").alias("month"),
            "value",
        )
        .groupBy("event_type", "day", "month")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )
    return daily.groupBy("event_type", "month").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.round(F.sum("sum_v"), 2).cast("double").alias("sum_value"),
        F.round(F.min("min_v"), 4).alias("min_value"),
        F.round(F.max("max_v"), 4).alias("max_value"),
    )
