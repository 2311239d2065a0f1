"""Extended OLAP surface (SURVEY.md §2.2 continued, #48-56):
single-pass filtered aggregates, dimension-join reports, per-group
large-entity detection, running/moving window analytics, exact
quantiles, pivoted counts, and hierarchical rollups — the remaining
ClickHouse-style reporting shapes.

Scale notes identical to olap.py: broadcast dims, partial aggregation,
windows partitioned by the entity key. ROLLUP/pivot run as a single
shuffle with grouping sets / conditional aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register


# --------------------------------------------------------------------------
# 48. q6_forecast_revenue — single-pass filtered aggregate (TPC-H Q6 shape)
# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
             AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: pure scan + filter + agg. All three
    predicates push down to the parquet scan (PushedFilters), the agg is
    a single partial+final pair — the cheapest possible plan shape."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # decimal accumulation: order-independent exact sums (the
            # r11 half-cent-tie class, see q1)
            F.round(F.sum((F.col("l_extendedprice") * F.col("l_discount"))
                          .cast("decimal(38,6)")), 2)
            .cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# 49. q10_returned_items — returned-item report (TPC-H Q10 shape)
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top customers by returned-item revenue: lineitem⋈orders shuffle
    join, customer/nation broadcast, TakeOrdered top-20."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(F.sum((F.col("l_extendedprice")
                           * (1 - F.col("l_discount")))
                          .cast("decimal(38,6)")), 2)
            .cast("double").alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "n_name", "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# 50. q14_promo_share — conditional-aggregate ratio (TPC-H Q14 shape)
# --------------------------------------------------------------------------
@register(
    "q14_promo_share",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE), 4) AS promo_share,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share: broadcast part into the filtered
    lineitem scan; the ratio is two conditional sums in one agg pass."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                        .otherwise(0.0).cast("decimal(38,6)"))
                .cast("double")
                / F.sum(rev.cast("decimal(38,6)")).cast("double"),
                4,
            ).alias("promo_share"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# 51. q18_large_orders — HAVING-style large-entity detection (TPC-H Q18)
# --------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(t.sum_qty, 2) AS sum_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    ) t ON t.l_orderkey = o.o_orderkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: pre-aggregate lineitem on its own key
    (map-side combine), then semi-join the small survivor set to orders
    — never the raw join first. The classic push-agg-below-join plan."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .filter(F.col("sum_qty_raw") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty_raw", 2).alias("sum_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# 52. running_total — cumulative window aggregation
# --------------------------------------------------------------------------
@register(
    "running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS cum_spend,
           CAST(row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS INT) AS order_seq
    FROM orders
    """,
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative spend + order sequence — running-state
    analytics in one window shuffle on the customer key."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).cast("double").alias("cum_spend"),
        F.row_number().over(w).cast("int").alias("order_seq"),
    )


# --------------------------------------------------------------------------
# 53. moving_average — range-framed time window
# --------------------------------------------------------------------------
@register(
    "moving_average",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2)
               AS DOUBLE) AS day_value,
             COUNT(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT day, day_value, n_events,
           ROUND(AVG(day_value) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
             AS ma7
    FROM daily
    """,
)
def moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily event value: pre-rollup to days
    (tiny), then a single-partition window over the day series — the
    windowed input is already aggregated so the global window is cheap."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
        .cast("double").alias("day_value"),
        F.count("*").alias("n_events"),
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day", "day_value", "n_events", F.round(F.avg("day_value").over(w), 4).alias("ma7")
    )


# --------------------------------------------------------------------------
# 54. value_quantiles — exact interpolated quantiles per group
# --------------------------------------------------------------------------
@register(
    "value_quantiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(MIN(value), 2) AS min_value,
           ROUND(MAX(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
)
def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p95 per event type (ClickHouse
    quantileExact analog). percentile() is exact and matches DuckDB's
    quantile_cont interpolation; at 100 TB the approx variant
    (percentile_approx / t-digest) swaps in with the same plan shape."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


# --------------------------------------------------------------------------
# 55. event_type_pivot — pivoted conditional counts
# --------------------------------------------------------------------------
@register(
    "event_type_pivot",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(ROUND(SUM(CAST(CASE WHEN event_type = 'purchase'
                 THEN value ELSE 0 END AS DECIMAL(38,6))), 2) AS DOUBLE)
             AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user activity profile: pivot as conditional aggregation
    (single shuffle; a literal .pivot() needs two passes or an explicit
    value list — conditional agg is the 100 TB-friendly form)."""
    e = load(spark, sf_dir, "events")

    def cnt(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long")

    return e.groupBy("user_id").agg(
        cnt("click").alias("n_click"),
        cnt("view").alias("n_view"),
        cnt("purchase").alias("n_purchase"),
        cnt("signup").alias("n_signup"),
        cnt("error").alias("n_error"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))
                  .otherwise(0.0).cast("decimal(38,6)")),
            2,
        ).cast("double").alias("purchase_value"),
    )


# --------------------------------------------------------------------------
# 56. status_priority_rollup — hierarchical ROLLUP aggregation
# --------------------------------------------------------------------------
@register(
    "status_priority_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2)
             AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def status_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (status → priority → grand total) via
    ROLLUP grouping sets — one shuffle produces all three levels."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2)
        .cast("double").alias("total_price"),
    )


# --------------------------------------------------------------------------
# 76. asof_join — as-of (point-in-time) join, union+window formulation
# --------------------------------------------------------------------------
@register(
    "asof_join",
    oracle="""
    WITH snaps AS (
      SELECT user_id, ts AS snap_ts, MAX(value) AS snap_value
      FROM events WHERE event_id % 100 = 0
      GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts, e.value, s.snap_ts, s.snap_value
    FROM events e
    ASOF LEFT JOIN snaps s
      ON e.user_id = s.user_id AND e.ts >= s.snap_ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the latest per-user snapshot at or
    before its timestamp (the point-in-time enrichment the reference
    approximates with argmax-by-updated_at reads of index_state,
    clickhouse_queries.js:115-125 — generalized to per-key history).

    Spark-first formulation: Spark has no ASOF JOIN operator, and a
    range join (`s.ts <= e.ts` + window) degenerates to O(n·m) per key.
    The scalable shape is UNION + WINDOW: tag snapshots and events,
    union them, and carry the last non-null snapshot forward with a
    running `last(ignorenulls)` over (user, ts). ONE shuffle on the key,
    each row touched once — survives any scale where a single user's
    history fits a partition (AQE splits the rest). Ties (event ts ==
    snapshot ts) sort the snapshot first, matching ASOF's >= semantics;
    snapshots are pre-deduped per (user, ts) so the order is total.
    """
    e = load(spark, sf_dir, "events")
    snaps = (
        e.filter(F.col("event_id") % 100 == 0)
        .groupBy("user_id", F.col("ts").alias("snap_ts"))
        .agg(F.max("value").alias("snap_value"))
    )
    tagged_s = snaps.select(
        "user_id",
        F.col("snap_ts").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("snap_ts"),
        "snap_value",
        F.lit(0).alias("is_event"),
    )
    tagged_e = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.lit(None).cast("timestamp").alias("snap_ts"),
        F.lit(None).cast("double").alias("snap_value"),
        F.lit(1).alias("is_event"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_s.unionAll(tagged_e).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.last("snap_ts", ignorenulls=True).over(w).alias("snap_ts"),
        F.last("snap_value", ignorenulls=True).over(w).alias("snap_value"),
        "is_event",
    )
    return filled.filter(F.col("is_event") == 1).drop("is_event")


# --------------------------------------------------------------------------
# 79. distinct_users_skew_safe — skew-proof exact distinct count
# --------------------------------------------------------------------------
@register(
    "distinct_users_skew_safe",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_users_skew_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type, shaped for skew: event_type
    has ~5 values, so a direct groupBy(event_type).agg(countDistinct)
    would funnel the whole table through 5 reducers. Instead the first
    aggregate keys on the WIDE composite (event_type, user_id) — evenly
    spread, partial-agg collapses duplicates map-side — and the second
    counts the survivors per type (tiny input). Same two-exchange count
    as Spark's distinct rewrite but with the heavy shuffle on a
    skew-free key; at 100 TB swap stage 2's input for the stage 1
    output and nothing changes. n_events rides along via a sum of
    per-(type,user) partial counts — no extra pass."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("event_type", "user_id").agg(
        F.count("*").alias("c")
    )
    return per_user.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("n_events"),
    )


# --------------------------------------------------------------------------
# 115. salted_skew_join — manual key-salting for joins AQE can't fix
# --------------------------------------------------------------------------
N_SALT = 8


@register(
    "salted_skew_join",
    oracle="""
    WITH dim AS (
      -- integer-quantized mean: floor(value*1e6) per row is the same
      -- bigint on both engines, its SUM is exact, and the // floor
      -- division keeps every later step integer — the double AVG +
      -- floor(avg*10000) form sat on a knife edge that flipped at the
      -- 10x sweep scale
      SELECT user_id,
             SUM(CAST(floor(value * 1000000) AS BIGINT))
               // (100 * COUNT(*)) AS avg_q
      FROM events GROUP BY 1
    ),
    fact AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS skew_uid
      FROM events
    )
    SELECT event_type, COUNT(*) AS n_joined,
           ROUND(SUM(avg_q) / 10000.0, 4) AS sum_dim_value
    FROM fact JOIN dim ON dim.user_id = fact.skew_uid
    GROUP BY 1
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manually salted shuffle join — the §4 fallback for skew that AQE
    can NOT fix: AQE's skew split only applies to terminal sort-merge
    stages (not streaming state joins, not joins whose output
    partitioning a later stage reuses), and only after a stage
    materializes. Here half the fact lands on one hot key (a
    deterministic `event_id % 2 → key 0` skew, mirroring how one
    contract address dominates a real event stream).

    The pattern: fact rows carry `salt = event_id % {N_SALT}`; the dim
    side is exploded ×{N_SALT} (one copy per salt); the join keys on
    (key, salt), so the hot key's rows spread over {N_SALT} reducers —
    per-task input drops to 1/{N_SALT} of the hot key at the cost of
    duplicating the SMALL side {N_SALT}×. The merge hint pins the
    shuffle join so test scale doesn't broadcast away the demo; the
    oracle is the UNSALTED join — salting must be result-invariant."""
    e = load(spark, sf_dir, "events")
    # integer-quantized per-user mean (see the oracle comment): every
    # step after the per-row floor is exact integer math, so the dim
    # values are bit-identical across engines and row orders
    dim = (
        e.groupBy("user_id")
        .agg(F.sum(F.floor(F.col("value") * 1000000).cast("long"))
             .alias("svq"),
             F.count("*").alias("nu"))
        .select("user_id", F.expr("svq div (100 * nu)").alias("avg_q"))
    )
    fact = e.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("skew_uid"),
    ).withColumn("salt", (F.col("event_id") % N_SALT).cast("int"))
    dim_salted = dim.select(
        "user_id",
        "avg_q",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))).alias("salt"),
    )
    return (
        fact.hint("merge")
        .join(
            dim_salted,
            (fact.skew_uid == dim_salted.user_id) & (fact.salt == dim_salted.salt),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_joined"),
            F.round(F.sum("avg_q") / 10000.0, 4).alias("sum_dim_value"),
        )
    )


# --------------------------------------------------------------------------
# 84. approx_sketch_stats — the approximate scale path (HLL + percentile
#     sketch), oracle-backed via in-query error-bound flags
# --------------------------------------------------------------------------
@register(
    "approx_sketch_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           CAST(1 AS INT) AS hll_ok,
           CAST(1 AS INT) AS p50_ok,
           CAST(1 AS INT) AS p95_ok
    FROM events GROUP BY event_type
    """,
)
def approx_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-based twins of the exact aggregates — ClickHouse's
    uniq() (HyperLogLog++) and quantileTDigest() — which are what
    actually runs at 100 TB: constant-memory per group, one pass,
    mergeable partials (so partial aggregation still collapses
    map-side, unlike exact percentile which buffers every value).

    approx_count_distinct = HLL++ at 5% rsd; approx_percentile =
    positional sketch at accuracy 10000 (~0.01% rank error). The raw
    sketch values are engine-specific by construction, so instead of
    emitting them this query compares them to the EXACT aggregates in
    the same pass and emits within-published-error-bound FLAGS plus
    the exact values — every output column is deterministic, so the
    oracle checks them all: the exact columns by value, the flags by
    asserting 1 (i.e. the driver hash now FAILS if either sketch ever
    drifts outside its bound — strictly stronger than the old
    rows-only registration; VERDICT r5 stretch #9).
    tests/test_approx.py keeps the bounds gated in-process too."""
    e = load(spark, sf_dir, "events")
    a = e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("_hll"),
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("_p50s"),
        F.approx_percentile("value", F.lit(0.95), F.lit(10000)).alias("_p95s"),
    )
    spread = F.col("p95") - F.col("p50") + F.lit(1e-9)
    return a.select(
        "event_type",
        "n_events",
        "exact_users",
        "p50",
        "p95",
        (
            F.abs(F.col("_hll") - F.col("exact_users"))
            <= F.greatest(F.lit(3), 0.15 * F.col("exact_users"))
        ).cast("int").alias("hll_ok"),
        (F.abs(F.col("_p50s") - F.col("p50")) <= 0.1 * spread)
        .cast("int").alias("p50_ok"),
        (F.abs(F.col("_p95s") - F.col("p95")) <= 0.1 * spread)
        .cast("int").alias("p95_ok"),
    )


# --------------------------------------------------------------------------
# 89. q4_priority_semi — EXISTS semi-join (TPC-H Q4 shape)
# --------------------------------------------------------------------------
@register(
    "q4_priority_semi",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= DATE '1995-01-01'
      AND o_orderdate < DATE '1995-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late-shipping line,
    counted by priority. EXISTS compiles to a LEFT-SEMI join — the probe
    side short-circuits on first match and the build side carries only
    (orderkey, shipdate), so the semi-join never materializes lineitem's
    width. Date filter pushes to the orders scan and prunes before the
    join."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --------------------------------------------------------------------------
# 90. q22_idle_customers_anti — NOT EXISTS anti-join (TPC-H Q22 shape)
# --------------------------------------------------------------------------
@register(
    "q22_idle_customers_anti",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_idle,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))), 2)
             AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 0
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '1995-01-01'
                        AND o.o_orderdate < DATE '1996-01-01')
    GROUP BY n.n_name
    """,
)
def q22_idle_customers_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers with no 1995 order,
    rolled up by nation. NOT EXISTS is a LEFT-ANTI join on the custkey;
    orders is filtered (pushdown) and projected to the single join
    column before the shuffle, and the nation name attaches afterwards
    via broadcast (25 rows) — the anti-join runs on the narrowest
    possible inputs."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
        )
        .select("o_custkey")
    )
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation")
    )
    idle = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(n), "c_nationkey")
        .groupBy("nation")
        .agg(
            F.count("*").alias("n_idle"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(38,6)")), 2).cast("double").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# 95. q7_nation_volume — bi-directional nation-pair trade (TPC-H Q7 shape)
# --------------------------------------------------------------------------
@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair, both
    directions, by year. The interesting plan property: BOTH nation
    joins broadcast and their filters APPLY BEFORE the fact-fact join —
    customer and supplier shrink to one nation each, so the surviving
    orders/lineitem rows are a small fraction before the only real
    shuffle (lineitem ⋈ orders on orderkey, bloom-filtered)."""
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = ("NATION_1", "NATION_2")
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n.filter(F.col("n_name").isin(*pair))),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n.filter(F.col("n_name").isin(*pair))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    j = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        # decimal accumulation: double summation is order-dependent and
        # drifted 0.01 after rounding at the 10x sweep scale (the q1
        # lesson applied here); per-row products are identical IEEE
        # doubles on both engines, the decimal SUM is exact
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .cast("decimal(38,6)")), 2
        ).cast("double").alias("revenue")
    )


# --------------------------------------------------------------------------
# 96. q8_market_share — region market share by year (TPC-H Q8 shape)
# --------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_7'
                          THEN volume ELSE 0 END AS DECIMAL(38,6)))
                      AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE),
                 4) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's purchase volume
    per year. Conditional-sum-over-sum computes the share in the SAME
    aggregation (no second pass, no join of two aggregates); the
    region/nation dims collapse to broadcasts and the customer-region
    filter prunes orders before the fact-fact shuffle."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey")
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(eu_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
    )
    return j.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", volume)
                  .otherwise(0.0).cast("decimal(38,6)")).cast("double")
            / F.sum(volume.cast("decimal(38,6)")).cast("double"),
            4,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# 97. q15_top_supplier — max-revenue supplier(s) (TPC-H Q15 shape)
# --------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      -- per-row cents floor + integer SUM: order-independent and
      -- bit-identical across engines, so the =MAX equality can never
      -- flip on a summation-order ulp (the q2 failure class)
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS total_revenue_c
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           -- CAST required: DuckDB types integer SUM as HUGEINT, which the
           -- driver's hasher renders differently than Spark's long even
           -- when the values are equal (the r4 hash-fail class).
           CAST(r.total_revenue_c AS BIGINT) AS total_revenue_c
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_c = (SELECT MAX(total_revenue_c) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue. The
    revenue CTE computes once; the max is a broadcast scalar (no window
    over the full aggregate, no second scan of lineitem — Spark caches
    nothing here, but the agg input is the already-tiny rev relation).
    Ties (= max) are all returned, matching the spec."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    # per-row cents floor + integer SUM (see oracle note): the =MAX
    # equality never flips on a summation-order ulp
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("total_revenue_c")
    )
    mx = rev.agg(F.max("total_revenue_c").alias("mx"))
    top = rev.join(F.broadcast(mx), rev.total_revenue_c == mx.mx).select(
        "supplier_no", "total_revenue_c"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(
        F.broadcast(top), s.s_suppkey == top.supplier_no
    ).select("s_suppkey", "s_name", "total_revenue_c")


# --------------------------------------------------------------------------
# 176. asof_join_tolerance — bounded-staleness + bidirectional as-of
# --------------------------------------------------------------------------
ASOF_TOL_MIN = 60  # staleness bound for the backward leg, minutes


@register(
    "asof_join_tolerance",
    oracle=f"""
    WITH snaps AS (
      SELECT user_id, ts AS snap_ts, MAX(value) AS snap_value
      FROM events WHERE event_id % 100 = 0
      GROUP BY user_id, ts
    ),
    back AS (
      SELECT e.event_id, e.user_id, e.ts, b.snap_ts AS b_ts,
             b.snap_value AS b_value
      FROM events e
      ASOF LEFT JOIN snaps b
        ON e.user_id = b.user_id AND e.ts >= b.snap_ts
    )
    SELECT bk.event_id, bk.user_id, bk.ts,
           CASE WHEN bk.b_ts >= bk.ts - INTERVAL {ASOF_TOL_MIN} MINUTE
                THEN bk.b_ts END AS back_ts,
           CASE WHEN bk.b_ts >= bk.ts - INTERVAL {ASOF_TOL_MIN} MINUTE
                THEN bk.b_value END AS back_value,
           f.snap_ts AS fwd_ts, f.snap_value AS fwd_value
    FROM back bk
    ASOF LEFT JOIN snaps f
      ON bk.user_id = f.user_id AND bk.ts < f.snap_ts
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound and both directions — the
    feature-store/backtest enrichment shape: each event takes the
    latest per-user snapshot at-or-before its timestamp ONLY if it is
    at most {ASOF_TOL_MIN} minutes old (a stale feature is worse than
    no feature), plus the next snapshot strictly after (the
    lookahead/label leg of a backtest).

    Same UNION + WINDOW formulation as asof_join (#76) — Spark has no
    ASOF operator and a range join degenerates per key — but run in
    BOTH directions over one union: a forward pass carries the last
    snapshot at-or-before, a backward pass (same partitioning, reversed
    order) carries the first snapshot after; the tolerance is a plain
    column predicate applied AFTER the carry, exactly as the oracle
    nulls stale rows post-ASOF. Still ONE shuffle on user_id — the
    second window reuses the first's hash partitioning with only a
    sort between."""
    e = load(spark, sf_dir, "events")
    snaps = (
        e.filter(F.col("event_id") % 100 == 0)
        .groupBy("user_id", F.col("ts").alias("snap_ts"))
        .agg(F.max("value").alias("snap_value"))
    )
    tagged_s = snaps.select(
        "user_id",
        F.col("snap_ts").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("snap_ts").alias("s_ts"),
        F.col("snap_value").alias("s_value"),
        F.lit(0).alias("is_event"),
    )
    tagged_e = e.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("s_ts"),
        F.lit(None).cast("double").alias("s_value"),
        F.lit(1).alias("is_event"),
    )
    u = tagged_s.unionAll(tagged_e)
    # backward carry: snapshots sort BEFORE events at equal ts (>=)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward carry: reversed order; events sort after snapshots there
    # too (is_event desc puts the event first when scanning backward,
    # so an equal-ts snapshot is NOT its own forward match — strict >)
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_event").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "event_id",
        "user_id",
        "ts",
        "is_event",
        F.last("s_ts", ignorenulls=True).over(wb).alias("b_ts"),
        F.last("s_value", ignorenulls=True).over(wb).alias("b_value"),
        F.last("s_ts", ignorenulls=True).over(wf).alias("f_ts"),
        F.last("s_value", ignorenulls=True).over(wf).alias("f_value"),
    ).filter(F.col("is_event") == 1)
    fresh = F.col("b_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOL_MIN} MINUTE"
    )
    return filled.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("b_ts")).alias("back_ts"),
        F.when(fresh, F.col("b_value")).alias("back_value"),
        F.col("f_ts").alias("fwd_ts"),
        F.col("f_value").alias("fwd_value"),
    )
