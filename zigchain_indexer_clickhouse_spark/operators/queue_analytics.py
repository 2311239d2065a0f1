"""Work-queue & failure analytics (SURVEY.md §2.1 #12-20).

Re-expresses the orchestrator's queue management queries
(src/database/clickhouse_queries.js, src/core/orchestrator.js) and the
health monitor (scripts/monitor_indexer.js) as DataFrame plans.

`orders` models work_queue rows (o_orderstatus ≈ status), `events`
models activity timestamps. "now" is pinned to a literal so the oracle
replays bit-identically (the reference uses wall-clock NOW()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

# Pinned wall-clock for age computations (events span 2024-01).
NOW = "2024-02-01 00:00:00"


# --------------------------------------------------------------------------
# 12. queue_status_counts (monitor_indexer.js:46-53)
# --------------------------------------------------------------------------
@register(
    "queue_status_counts",
    oracle="""
    SELECT o_orderstatus AS status, COUNT(*) AS n_items,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_height,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_height,
           MIN(o_orderdate) AS oldest, MAX(o_orderdate) AS newest
    FROM orders GROUP BY o_orderstatus
    """,
)
def queue_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work-queue status rollup: count + height range per status
    (monitor_indexer.js:46-53, clickhouse_queries.js:153-158)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n_items"),
        F.min("o_orderkey").cast("long").alias("min_height"),
        F.max("o_orderkey").cast("long").alias("max_height"),
        F.min("o_orderdate").alias("oldest"),
        F.max("o_orderdate").alias("newest"),
    )


# --------------------------------------------------------------------------
# 13. pending_work_topn (clickhouse_queries.js:163-168)
# --------------------------------------------------------------------------
@register(
    "pending_work_topn",
    oracle="""
    SELECT o_orderkey AS id,
           CAST(o_orderkey * 1000 + 1 AS BIGINT) AS start_height,
           CAST(o_orderkey * 1000 + 1000 AS BIGINT) AS end_height,
           o_orderdate AS created_at
    FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_orderkey LIMIT 10
    """,
)
def pending_work_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * FROM work_queue WHERE status='pending' ORDER BY id LIMIT n`
    (clickhouse_queries.js:163-168). Runs as TakeOrderedAndProject — no
    global sort materialization."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        o.select(
            F.col("o_orderkey").alias("id"),
            (F.col("o_orderkey") * 1000 + 1).cast("long").alias("start_height"),
            (F.col("o_orderkey") * 1000 + 1000).cast("long").alias("end_height"),
            F.col("o_orderdate").alias("created_at"),
        )
        .orderBy("id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# 14. overlapping_ranges (clickhouse_queries.js:220-229)
# --------------------------------------------------------------------------
@register(
    "overlapping_ranges",
    # The naive oracle form (r a JOIN r b ON a.id < b.id AND NOT
    # (b.e < a.s OR a.e < b.s)) has no equi-key, so DuckDB runs an
    # IEJoin over the full n² pair space — the 992 s sf1.0 gate row
    # (VERDICT r11 next #4). This form buckets both sides exactly like
    # the Spark plan and counts each pair in its first shared bucket;
    # tests/test_oracle_rewrites.py pins it bit-identical to the naive
    # SQL at sf0.001, so the oracle's semantics are still anchored to
    # the reference predicate, not to the engine's algorithm.
    oracle="""
    WITH r AS MATERIALIZED (
      SELECT o_orderkey AS id, o_orderkey * 10 AS s,
             o_orderkey * 10 + 5 + (o_custkey % 30) AS e
      FROM orders WHERE o_orderstatus IN ('O', 'P')
    ),
    bk AS MATERIALIZED (
      SELECT id, s, e,
             UNNEST(range(s // 64, e // 64 + 1)) AS bucket
      FROM r
    )
    SELECT a.id AS work_id, COUNT(*) AS n_overlaps
    FROM bk a JOIN bk b
      ON a.bucket = b.bucket AND a.id < b.id
    WHERE NOT (b.e < a.s OR a.e < b.s)
      AND a.bucket = GREATEST(a.s // 64, b.s // 64)
    GROUP BY a.id
    """,
)
def overlapping_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping work ranges (clickhouse_queries.js:220-229
    getOverlappingRanges): `NOT (e2 < s1 OR e1 < s2)`.

    Scale design: a naive range self-join is O(n²). Both sides are
    exploded onto fixed-width buckets spanned by each interval, joined on
    the bucket (equi-join → shuffle hash join), de-duplicated, then the
    exact overlap predicate filters candidates. Cost O(n·k) with k =
    avg buckets per interval (≤2 here); holds at 100 TB where intervals
    are short relative to the domain.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus").isin("O", "P"))
    r = o.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") * 10).alias("s"),
        (F.col("o_orderkey") * 10 + 5 + F.col("o_custkey") % 30).alias("e"),
    )
    width = 64
    bucketed = r.select(
        "id",
        "s",
        "e",
        F.explode(
            F.sequence(F.floor(F.col("s") / width), F.floor(F.col("e") / width))
        ).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    # A pair sharing k buckets would be emitted k times; instead of a
    # distinct() (an extra shuffle of the whole candidate set), count
    # each pair only in its FIRST shared bucket — max of the two start
    # buckets — which every overlapping pair hits exactly once.
    first_shared = F.greatest(
        F.floor(F.col("a.s") / width), F.floor(F.col("b.s") / width)
    )
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .filter(~((F.col("b.e") < F.col("a.s")) | (F.col("a.e") < F.col("b.s"))))
        .filter(F.col("a.bucket") == first_shared)
        .select(F.col("a.id").alias("work_id"))
    )
    return pairs.groupBy("work_id").agg(F.count("*").alias("n_overlaps"))


# --------------------------------------------------------------------------
# 15. gap_detection (monitor_indexer.js:91-105)
# --------------------------------------------------------------------------
@register(
    "gap_detection",
    # Series-free oracle (r12): the old form materialized
    # generate_series(0, 10000000) — DuckDB 1.0 rejects subquery
    # bounds, and the CONSTANT bound silently truncated the expected
    # domain once the sf1.0 replica's stride-floored heights passed
    # 10M (caught by the r12 sweep: Spark 89,151,010 gaps vs oracle
    # 9,900,102). Gaps-and-islands instead: over [0, mh],
    # gap_count = mh+1 - |present|, and the first/last missing height
    # is always one of {0, mh, present±1} (if min-missing m > 0 then
    # m-1 is present; if max-missing m < mh then m+1 is present), so
    # no height series is ever generated — O(n) at any scale.
    # present AS MATERIALIZED: referenced 3×; DuckDB inlines CTEs
    # (the r11 dup-graph defect class).
    oracle="""
    WITH present AS MATERIALIZED (
      SELECT DISTINCT o_orderkey AS height FROM orders WHERE o_orderstatus <> 'O'
    ),
    mx AS (SELECT MAX(o_orderkey) AS mh FROM orders),
    cand AS (
      SELECT c.h FROM (
        SELECT 0 AS h
        UNION ALL SELECT height + 1 FROM present
        UNION ALL SELECT height - 1 FROM present
        UNION ALL SELECT mh FROM mx
      ) c
      LEFT JOIN present p ON p.height = c.h
      WHERE p.height IS NULL
        AND c.h >= 0 AND c.h <= (SELECT mh FROM mx)
    )
    SELECT CAST((SELECT mh FROM mx) + 1
                - (SELECT COUNT(*) FROM present) AS BIGINT) AS gap_count,
           CAST((SELECT MIN(h) FROM cand) AS BIGINT) AS first_gap,
           CAST((SELECT MAX(h) FROM cand) AS BIGINT) AS last_gap
    """,
)
def gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-block detection (monitor_indexer.js:91-105
    generate_series + LEFT JOIN ... IS NULL), computed SERIES-FREE —
    the r12 oracle rewrite's gaps-and-islands argument, now applied to
    the engine side too (r13, guide §2.3: the r1-r12 plan exploded the
    whole [0, max_height] domain — 10¹¹ rows at chain scale — to
    anti-join ~|present| of them away again):

    - gap_count = mh + 1 − |present| (two aggregates, no series);
    - the first/last missing height is always one of
      {0, mh, present±1}: if the minimum missing m > 0 then m−1 is
      present, and if the maximum missing m < mh then m+1 is present —
      so 2·|present| + 2 candidates anti-joined with present replace
      the (mh+1)-row series. Cost O(|present|) at any scale.

    Candidates ride the anti-join on the same height key the present
    set was deduplicated on; the result is the oracle's own candidate
    construction, mirrored term for term.
    """
    o = load(spark, sf_dir, "orders")
    present = o.filter(F.col("o_orderstatus") != "O").select(
        F.col("o_orderkey").alias("height")
    ).distinct()
    # ONE scan of orders yields both scalars: the domain top and the
    # present-set size (count of distinct non-'O' keys ≡ |present|)
    stats = o.agg(
        F.max("o_orderkey").alias("mh"),
        F.count_distinct(
            F.when(F.col("o_orderstatus") != "O", F.col("o_orderkey"))
        ).alias("np"),
    )
    cand = present.select(
        F.explode(F.array(F.col("height") + 1, F.col("height") - 1)).alias("h")
    ).unionAll(
        stats.select(F.explode(F.array(F.lit(0).cast("long"), F.col("mh"))).alias("h"))
    )
    missing = (
        cand.join(F.broadcast(stats), F.lit(True))
        .filter((F.col("h") >= 0) & (F.col("h") <= F.col("mh")))
        .select("h")
        .join(present, F.col("h") == present.height, "left_anti")
    )
    bounds = missing.agg(
        F.min("h").cast("long").alias("first_gap"),
        F.max("h").cast("long").alias("last_gap"),
    )
    return (
        stats.join(F.broadcast(bounds), F.lit(True))
        .select(
            (F.col("mh") + 1 - F.col("np")).cast("long").alias("gap_count"),
            "first_gap",
            "last_gap",
        )
    )


# --------------------------------------------------------------------------
# 16. failed_block_backoff (worker.js:335-374, retry_failed.js:82-84)
# --------------------------------------------------------------------------
@register(
    "failed_block_backoff",
    oracle="""
    SELECT o_orderkey AS block_height,
           CAST(o_orderkey % 8 AS INT) AS retry_count,
           CAST(least(600, CAST(pow(2, least(o_orderkey % 8, 5)) AS BIGINT) * 30)
                AS BIGINT) AS backoff_s,
           o_orderdate + INTERVAL 1 SECOND *
             least(600, CAST(pow(2, least(o_orderkey % 8, 5)) AS BIGINT) * 30)
             AS next_retry_at,
           CASE WHEN o_orderkey % 8 >= 5 THEN 'failed_permanently'
                ELSE 'pending' END AS status
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def failed_block_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failed-block retry scheduling with capped exponential backoff:
    `min(cap, base * 2^min(retries, 5))` (worker.js:352-357,
    retry_failed.js:82-84 computeBackoffSeconds) and permanent-failure
    status transition (worker.js:357)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    retry = (F.col("o_orderkey") % 8).cast("int")
    backoff = F.least(
        F.lit(600).cast("long"), F.pow(2, F.least(retry, F.lit(5))).cast("long") * 30
    )
    return o.select(
        F.col("o_orderkey").alias("block_height"),
        retry.alias("retry_count"),
        backoff.alias("backoff_s"),
        F.timestamp_add("SECOND", backoff, F.col("o_orderdate")).alias("next_retry_at"),
        F.when(retry >= 5, "failed_permanently").otherwise("pending").alias("status"),
    )


# --------------------------------------------------------------------------
# 17. stale_detection (monitor_indexer.js:161-226)
# --------------------------------------------------------------------------
@register(
    "stale_detection",
    oracle=f"""
    SELECT COUNT(*) AS stuck_count,
           CAST(MIN(floor(epoch(TIMESTAMP '{NOW}' - ts) / 60)) AS BIGINT) AS min_minutes,
           CAST(MAX(floor(epoch(TIMESTAMP '{NOW}' - ts) / 60)) AS BIGINT) AS max_minutes
    FROM events
    WHERE event_type = 'view' AND ts < TIMESTAMP '{NOW}' - INTERVAL 7 DAY
    """,
)
def stale_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck/stale item detection: items in a live status whose
    updated_at is older than a threshold, with min/max age in minutes
    (monitor_indexer.js:161-174, 215-226)."""
    e = load(spark, sf_dir, "events")
    now = F.lit(NOW).cast("timestamp")
    age_min = F.floor((now.cast("long") - F.col("ts").cast("long")) / 60)
    return (
        e.filter(
            (F.col("event_type") == "view")
            & (F.col("ts") < F.timestamp_add("DAY", F.lit(-7), now))
        )
        .agg(
            F.count("*").alias("stuck_count"),
            F.min(age_min).cast("long").alias("min_minutes"),
            F.max(age_min).cast("long").alias("max_minutes"),
        )
    )


# --------------------------------------------------------------------------
# 18. duplicate_ranges (monitor_indexer.js:197-206)
# --------------------------------------------------------------------------
@register(
    "duplicate_ranges",
    oracle="""
    SELECT o_custkey, o_orderpriority, COUNT(*) AS n_queued
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_custkey, o_orderpriority
    HAVING COUNT(*) > 1
    """,
)
def duplicate_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate pending work detection: same range queued more than once
    (monitor_indexer.js:197-206): groupBy + HAVING count>1."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        o.groupBy("o_custkey", "o_orderpriority")
        .agg(F.count("*").alias("n_queued"))
        .filter(F.col("n_queued") > 1)
    )


# --------------------------------------------------------------------------
# 19. looping_ranges (monitor_indexer.js:177-188)
# --------------------------------------------------------------------------
@register(
    "looping_ranges",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n_times
    FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY user_id, event_type
    HAVING COUNT(*) > 2
    """,
)
def looping_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loop detection: the same work re-queued >2 times within a recent
    window (monitor_indexer.js:177-188)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_times"))
        .filter(F.col("n_times") > 2)
    )


# --------------------------------------------------------------------------
# 20. recent_activity (monitor_indexer.js:119-129)
# --------------------------------------------------------------------------
@register(
    "recent_activity",
    oracle="""
    SELECT event_type, COUNT(*) AS recent_count
    FROM events
    WHERE ts > (SELECT MAX(ts) - INTERVAL 24 HOUR FROM events)
    GROUP BY event_type
    """,
)
def recent_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window activity counts (monitor_indexer.js:119-129
    `WHERE created_at > NOW() - INTERVAL '1 hour'`), anchored to max(ts)
    so the check is reproducible. The cutoff broadcasts; the time filter
    partition-prunes on a date-partitioned layout."""
    e = load(spark, sf_dir, "events")
    cutoff = e.agg(F.timestamp_add("HOUR", F.lit(-24), F.max("ts")).alias("cutoff"))
    return (
        e.join(F.broadcast(cutoff))
        .filter(F.col("ts") > F.col("cutoff"))
        .groupBy("event_type")
        .agg(F.count("*").alias("recent_count"))
    )


# --------------------------------------------------------------------------
# 86. monitor_health_report — the monitor's combined dashboard
# --------------------------------------------------------------------------
@register(
    "monitor_health_report",
    oracle=f"""
    SELECT 'queue_' || o_orderstatus AS check, COUNT(*) AS n,
           CAST(MAX(o_orderkey) AS BIGINT) AS detail
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'gaps',
           CAST((SELECT MAX(o_orderkey) FROM orders) + 1
                - (SELECT COUNT(DISTINCT o_orderkey) FROM orders
                   WHERE o_orderstatus <> 'O') AS BIGINT),
           (SELECT CAST(MAX(c.h) AS BIGINT) FROM (
              SELECT height - 1 AS h
              FROM (SELECT DISTINCT o_orderkey AS height FROM orders
                    WHERE o_orderstatus <> 'O')
              UNION ALL SELECT MAX(o_orderkey) FROM orders
            ) c
            LEFT JOIN (SELECT DISTINCT o_orderkey AS height FROM orders
                       WHERE o_orderstatus <> 'O') p ON p.height = c.h
            WHERE p.height IS NULL AND c.h >= 0
              AND c.h <= (SELECT MAX(o_orderkey) FROM orders))
    UNION ALL
    SELECT 'stuck_items', COUNT(*),
           CAST(MAX(floor(epoch(TIMESTAMP '{NOW}' - ts) / 60)) AS BIGINT)
    FROM events
    WHERE event_type = 'view' AND ts < TIMESTAMP '{NOW}' - INTERVAL 7 DAY
    UNION ALL
    SELECT 'duplicate_ranges', COUNT(*), CAST(MAX(n_queued) AS BIGINT) FROM (
      SELECT COUNT(*) AS n_queued FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_custkey, o_orderpriority HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'looping_ranges', COUNT(*), CAST(MAX(n_times) AS BIGINT) FROM (
      SELECT COUNT(*) AS n_times FROM events
      WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY user_id, event_type HAVING COUNT(*) > 2)
    UNION ALL
    SELECT 'recent_activity', COUNT(*),
           CAST(COUNT(DISTINCT event_type) AS BIGINT)
    FROM events WHERE ts > (SELECT MAX(ts) - INTERVAL 24 HOUR FROM events)
    UNION ALL
    SELECT 'db_blocks', COUNT(*), CAST(MAX(o_orderkey) AS BIGINT) FROM orders
    """,
)
def monitor_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The monitor's end-to-end health dashboard in one result set
    (scripts/monitor_indexer.js:24-230 runs these checks sequentially
    and prints them): queue status rollup, gap scan, stuck items,
    duplicate/looping ranges, recent activity, and table totals, each
    as a (check, n, detail) row.

    Shape: seven independent small aggregates unioned — Spark runs the
    branches as parallel jobs over shared scan subtrees; every branch
    is a partial-agg-collapsible groupBy or a single-row agg, so the
    report costs roughly two table scans regardless of data size
    (the reference runs 7 sequential ClickHouse round-trips)."""
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    now = F.lit(NOW).cast("timestamp")

    queue = o.groupBy("o_orderstatus").agg(
        F.concat(F.lit("queue_"), F.col("o_orderstatus")).alias("check"),
        F.count("*").alias("n"),
        F.max("o_orderkey").cast("long").alias("detail"),
    ).select("check", "n", "detail")

    # series-free gaps branch (r13, same argument as gap_detection):
    # the count is mh+1 − |present|, and the LAST missing height is
    # always present−1 or mh — so 2 aggregates + |present|+1 candidates
    # replace the exploded [0, mh] series the r1-r12 plan anti-joined
    # away (O(domain) rows at chain scale). Mirrors the r12 oracle.
    present = o.filter(F.col("o_orderstatus") != "O").select(
        F.col("o_orderkey").alias("height")
    ).distinct()
    gap_stats = o.agg(
        F.max("o_orderkey").alias("mh"),
        F.count_distinct(
            F.when(F.col("o_orderstatus") != "O", F.col("o_orderkey"))
        ).alias("np"),
    )
    cand = present.select((F.col("height") - 1).alias("h")).unionAll(
        gap_stats.select(F.col("mh").alias("h"))
    )
    last_missing = (
        cand.join(F.broadcast(gap_stats), F.lit(True))
        .filter((F.col("h") >= 0) & (F.col("h") <= F.col("mh")))
        .select("h")
        .join(present, F.col("h") == present.height, "left_anti")
        .agg(F.max("h").cast("long").alias("detail"))
    )
    gaps = (
        gap_stats.join(F.broadcast(last_missing), F.lit(True))
        .select(
            F.lit("gaps").alias("check"),
            (F.col("mh") + 1 - F.col("np")).cast("long").alias("n"),
            "detail",
        )
    )

    age_min = F.floor((now.cast("long") - F.col("ts").cast("long")) / 60)
    stuck = e.filter(
        (F.col("event_type") == "view")
        & (F.col("ts") < F.timestamp_add("DAY", F.lit(-7), now))
    ).agg(
        F.lit("stuck_items").alias("check"),
        F.count("*").alias("n"),
        F.max(age_min).cast("long").alias("detail"),
    )

    dups = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey", "o_orderpriority")
        .agg(F.count("*").alias("n_queued"))
        .filter(F.col("n_queued") > 1)
        .agg(
            F.lit("duplicate_ranges").alias("check"),
            F.count("*").alias("n"),
            F.max("n_queued").cast("long").alias("detail"),
        )
    )

    loops = (
        e.filter(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_times"))
        .filter(F.col("n_times") > 2)
        .agg(
            F.lit("looping_ranges").alias("check"),
            F.count("*").alias("n"),
            F.max("n_times").cast("long").alias("detail"),
        )
    )

    cutoff = e.agg(F.timestamp_add("HOUR", F.lit(-24), F.max("ts")).alias("cutoff"))
    recent = (
        e.join(F.broadcast(cutoff), e.ts > cutoff.cutoff)
        .agg(
            F.lit("recent_activity").alias("check"),
            F.count("*").alias("n"),
            F.countDistinct("event_type").cast("long").alias("detail"),
        )
    )

    totals = o.agg(
        F.lit("db_blocks").alias("check"),
        F.count("*").alias("n"),
        F.max("o_orderkey").cast("long").alias("detail"),
    )

    return (
        queue.unionAll(gaps).unionAll(stuck).unionAll(dups)
        .unionAll(loops).unionAll(recent).unionAll(totals)
    )


# --------------------------------------------------------------------------
# 146. failed_error_breakdown (monitor_indexer.js:66-72)
# --------------------------------------------------------------------------
@register(
    "failed_error_breakdown",
    oracle="""
    WITH fb AS (
      SELECT o_orderkey AS height,
             CASE WHEN o_orderkey % 8 >= 5 THEN 'failed_permanently'
                  ELSE 'pending' END AS status,
             CASE CAST(o_orderkey % 3 AS INT)
               WHEN 0 THEN 'rpc_timeout'
               WHEN 1 THEN 'decode_error'
               ELSE 'db_error' END AS error_type
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT status, error_type, COUNT(*) AS n_blocks,
           CAST(MIN(height) AS BIGINT) AS min_height,
           CAST(MAX(height) AS BIGINT) AS max_height
    FROM fb GROUP BY status, error_type
    """,
)
def failed_error_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failed-blocks triage report (monitor_indexer.js:66-72):
    ``SELECT status, error_type, COUNT(*), MIN(height), MAX(height)
    FROM failed_blocks GROUP BY status, error_type`` — the monitor's
    per-error-class summary. Status follows failed_block_backoff's
    permanent-failure rule; error classes are a deterministic stand-in
    cycle (the harness has no real error strings). One
    map-side-combinable agg over ≤ statuses×classes groups."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    status = F.when((F.col("o_orderkey") % 8) >= 5, "failed_permanently").otherwise(
        "pending"
    )
    error_type = (
        F.when(F.col("o_orderkey") % 3 == 0, "rpc_timeout")
        .when(F.col("o_orderkey") % 3 == 1, "decode_error")
        .otherwise("db_error")
    )
    return (
        o.select(
            F.col("o_orderkey").alias("height"),
            status.alias("status"),
            error_type.alias("error_type"),
        )
        .groupBy("status", "error_type")
        .agg(
            F.count("*").alias("n_blocks"),
            F.min("height").cast("long").alias("min_height"),
            F.max("height").cast("long").alias("max_height"),
        )
    )


# --------------------------------------------------------------------------
# 147. catalog_verify (init_clickhouse.js:465-495 verifyTables, as a query)
# --------------------------------------------------------------------------
def _catalog_verify_oracle() -> str:
    from zigchain_indexer_clickhouse_spark.catalog import TABLES

    rows = " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, 'ok' AS status" for t in TABLES
    )
    return rows


@register("catalog_verify", oracle=_catalog_verify_oracle())
def catalog_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's startup table verification
    (init_clickhouse.js:465-495 verifyTables: enumerate system.tables,
    flag missing/drifted) surfaced as a gate query: one row per
    catalog table with its status. Against the driver's testdata every
    table must be 'ok'; a missing parquet or dropped column shows up
    as 'missing' / 'schema-drift: ...' and hash-fails the gate.

    Metadata-cost at any scale: schema inspection reads parquet
    FOOTERS only (see catalog.verify_catalog), no data pages."""
    from zigchain_indexer_clickhouse_spark.catalog import verify_catalog

    report = verify_catalog(spark, sf_dir)
    return spark.createDataFrame(
        sorted(report.items()), "table_name string, status string"
    )


# --------------------------------------------------------------------------
# 185. fk_orphan_check — referential-integrity audit across the star
# --------------------------------------------------------------------------
@register(
    "fk_orphan_check",
    oracle="""
    SELECT 'lineitem->orders' AS fk_edge,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    """,
)
def fk_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star: per foreign-key
    edge, how many child rows point at a missing parent. This is the
    write-fidelity check an indexer with multi-table fan-out actually
    needs — the reference's crash window between its per-table INSERTs
    (worker.js writes blocks, txs, events separately) is exactly where
    orphans are born; catalog_verify (#147) checks tables EXIST, this
    checks they AGREE.

    Plan: each edge is a LEFT ANTI join counted — parent key sets are
    dimension-sized and broadcast (orders→lineitem is the one
    fact-fact edge; its anti join keys the single shuffle). Four
    1-row aggregates union'd; no edge ever materializes the match,
    only the absence."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")

    def edge(name: str, child: DataFrame, ck: str,
             parent: DataFrame, pk: str) -> DataFrame:
        orphans = child.join(
            parent.select(F.col(pk).alias(ck)).distinct(), ck, "left_anti"
        )
        return (
            child.agg(F.count("*").alias("n_child"))
            .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
            .select(
                F.lit(name).alias("fk_edge"),
                F.col("n_child").cast("long"),
                F.col("n_orphans").cast("long"),
            )
        )

    return (
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(edge("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(edge("lineitem->part", li, "l_partkey", p, "p_partkey"))
        .unionByName(
            edge("lineitem->supplier", li, "l_suppkey", s, "s_suppkey")
        )
    )


# --------------------------------------------------------------------------
# 217. block_time_drift — inter-block gap health per day
# --------------------------------------------------------------------------
@register(
    "block_time_drift",
    oracle="""
    WITH b AS (
      SELECT event_id AS height, CAST(ts AS DATE) AS day,
             epoch_us(ts) AS t
      FROM events
    ),
    g AS (
      SELECT day,
             t - LAG(t) OVER (PARTITION BY day ORDER BY height) AS gap
      FROM b
    )
    SELECT day,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_blocks,
           CAST(floor(CAST(SUM(gap) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS mean_gap_us,
           CAST(MIN(gap) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap) AS BIGINT) AS max_gap_us,
           CAST(SUM(CASE WHEN gap > 10000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gaps_over_10s
    FROM g WHERE gap IS NOT NULL GROUP BY day
    """,
)
def block_time_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-production health: per day, the distribution of
    HEIGHT-consecutive block timestamp gaps — the "is the chain
    keeping its block time" monitor a chain operator reads next to the
    reference's recent-activity window (monitor_indexer.js:119-129
    checks volume; this checks cadence; negative gaps = out-of-order
    timestamps, the classic consensus-clock-skew smell).

    Exactness: gaps in integer epoch-micros; the mean is the one
    float step, computed as floor(double-division) with the identical
    expression on both engines; everything else is integer min/max/
    conditional count.

    Scale shape: the lag window partitions by DAY (the #197 stripe
    justification: bounded by a day's block count; heights within a
    stripe never cross executors), and the day roll-up shares the same
    partitioning — ONE exchange end-to-end. Day-boundary gaps are
    excluded identically on both engines (first block of each day has
    no predecessor)."""
    b = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("height"),
        F.col("ts").cast("date").alias("day"),
        F.unix_micros("ts").alias("t"),
    )
    w = Window.partitionBy("day").orderBy("height")
    g = b.select(
        "day", (F.col("t") - F.lag("t").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("day").agg(
        (F.count("*") + 1).cast("long").alias("n_blocks"),
        F.expr(
            "CAST(floor(CAST(SUM(gap) AS DOUBLE) / COUNT(*)) AS BIGINT)"
        ).alias("mean_gap_us"),
        F.min("gap").cast("long").alias("min_gap_us"),
        F.max("gap").cast("long").alias("max_gap_us"),
        F.sum((F.col("gap") > 10_000_000).cast("long"))
        .cast("long").alias("n_gaps_over_10s"),
    )


# --------------------------------------------------------------------------
# 218. reorg_candidates — same-height hash disagreement audit
# --------------------------------------------------------------------------
@register(
    "reorg_candidates",
    oracle="""
    WITH b AS (
      SELECT event_id // 2 AS height,
             CAST(event_id % 2 AS BIGINT) AS version,
             sha256(CAST(event_id // 2 AS VARCHAR)
                    || CASE WHEN event_id % 2 = 1 AND user_id % 10 = 0
                            THEN 'fork' ELSE '' END) AS block_hash
      FROM events
    )
    SELECT height,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT block_hash) AS BIGINT) AS n_variants,
           arg_max(block_hash, version) AS canonical_hash
    FROM b GROUP BY height
    HAVING COUNT(DISTINCT block_hash) > 1
    """,
)
def reorg_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-reorg audit: heights whose stored rows DISAGREE on the
    block hash — the disagreement the reference's ReplacingMergeTree
    engine silently resolves (models.js engine choice: latest version
    wins at merge time) but an operator should see BEFORE trusting
    FINAL reads. Synthetic forks: each height stores two versioned
    rows, and ~10% of version-1 rows carry a forked hash; the audit
    reports every disagreeing height with its row count, variant
    count, and the canonical (max-version) hash #9 replacing_dedup
    would keep.

    Scale shape: ONE map-side-combinable height agg (countDistinct
    expands to the standard two-level distinct plan; max_by rides the
    same exchange); only disagreeing heights materialize. At 100 TB
    this keys on the height partition axis, so the shuffle is
    partition-aligned with the storage layout (#23)."""
    b = load(spark, sf_dir, "events").select(
        (F.col("event_id") / 2).cast("long").alias("height"),
        (F.col("event_id") % 2).cast("long").alias("version"),
        F.sha2(
            F.concat(
                (F.col("event_id") / 2).cast("long").cast("string"),
                F.when(
                    (F.col("event_id") % 2 == 1) & (F.col("user_id") % 10 == 0),
                    F.lit("fork"),
                ).otherwise(F.lit("")),
            ),
            256,
        ).alias("block_hash"),
    )
    return (
        b.groupBy("height")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("block_hash").cast("long").alias("n_variants"),
            F.max_by("block_hash", "version").alias("canonical_hash"),
        )
        .filter(F.col("n_variants") > 1)
    )
