"""Orchestrator lifecycle operators (SURVEY.md §2.1 continued, #57-61):
retry-candidate selection, range enqueueing, per-range completeness,
processing reconciliation, and sync-progress resolution.

Reference: src/core/orchestrator.js (detectAndFillGaps,
cleanupOldWorkQueue, isRangeComplete, reconcileProcessingItems,
getLastIndexedHeight) and scripts/retry_failed.js (processBatch).

Work-queue rows derive deterministically from ``orders``
(o_orderstatus O/P/F ≈ pending/processing/failed) and the "indexed
blocks" set from non-pending orders, so the DuckDB oracle sees the
identical synthetic state. "now" is pinned (the reference uses
wall-clock NOW()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

NOW = "2001-12-01 00:00:00"  # orders span 1995-2001

# Derived work ranges: ~5-height spans over the orderkey domain.
_RANGE_SQL = (
    "o_orderkey AS id, o_orderkey * 5 AS start_height, "
    "o_orderkey * 5 + 4 + (o_custkey % 10) AS end_height"
)


def _ranges(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == status)
    return o.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") * 5).alias("start_height"),
        (F.col("o_orderkey") * 5 + 4 + F.col("o_custkey") % 10).alias("end_height"),
        F.col("o_orderdate").alias("updated_at"),
    )


def _present(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexed heights: the dense event_id prefix — models a chain
    indexed up to a height, with ranges beyond it incomplete."""
    e = load(spark, sf_dir, "events")
    return e.select(F.col("event_id").alias("height")).distinct()


# --------------------------------------------------------------------------
# 57. retry_candidates (retry_failed.js:114-123, cleanupOldWorkQueue)
# --------------------------------------------------------------------------
@register(
    "retry_candidates",
    oracle=f"""
    SELECT o_orderkey AS id,
           CAST(o_orderkey % 8 AS INT) AS attempts,
           o_orderdate + INTERVAL 1 SECOND *
             least(600, CAST(pow(2, least(o_orderkey % 8, 5)) AS BIGINT) * 30)
             AS next_retry_at,
           CAST(o_orderkey % 8 + 1 AS INT) AS next_attempt
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderkey % 8 < 5
      AND o_orderdate + INTERVAL 1 SECOND *
            least(600, CAST(pow(2, least(o_orderkey % 8, 5)) AS BIGINT) * 30)
          <= TIMESTAMP '{NOW}'
    """,
)
def retry_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retry queue scan (retry_failed.js:114-123): failed items due
    for retry — ``next_retry_at <= NOW() AND attempts < max`` — with the
    incremented attempt counter. Selective filter over the failed set;
    pushes to the scan."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    attempts = (F.col("o_orderkey") % 8).cast("int")
    backoff = F.least(
        F.lit(600).cast("long"), F.pow(2, F.least(attempts, F.lit(5))).cast("long") * 30
    )
    next_retry = F.timestamp_add("SECOND", backoff, F.col("o_orderdate"))
    return (
        o.select(
            F.col("o_orderkey").alias("id"),
            attempts.alias("attempts"),
            next_retry.alias("next_retry_at"),
            (attempts + 1).cast("int").alias("next_attempt"),
        )
        .filter(
            (F.col("attempts") < 5)
            & (F.col("next_retry_at") <= F.lit(NOW).cast("timestamp"))
        )
    )


# --------------------------------------------------------------------------
# 58. enqueue_ranges (orchestrator.js queue filling, forward-priority)
# --------------------------------------------------------------------------
# Forward-priority backfill controls (orchestrator.js:29-31): when
# BACKFILL_MODE is off, only pending ranges with
# start_height >= max(START_HEIGHT, max_indexed - BACKFILL_WINDOW) are
# eligible now; older ranges wait for an explicit backfill run.
BACKFILL_WINDOW = 300
START_HEIGHT = 1


@register(
    "enqueue_ranges",
    oracle=f"""
    WITH bounds AS (
      SELECT MAX(event_id) AS last_idx FROM events
    )
    SELECT CAST(g.i AS INT) AS batch_idx,
           CAST(last_idx - 500 + 1 + g.i * 100 AS BIGINT) AS start_height,
           CAST(last_idx - 500 + (g.i + 1) * 100 AS BIGINT) AS end_height,
           CAST(CASE WHEN last_idx - 500 + 1 + g.i * 100
                          >= greatest({START_HEIGHT},
                                      last_idx - {BACKFILL_WINDOW})
                     THEN 0 ELSE 1 END AS INT) AS priority,
           CAST(row_number() OVER (ORDER BY
                  CASE WHEN last_idx - 500 + 1 + g.i * 100
                            >= greatest({START_HEIGHT},
                                        last_idx - {BACKFILL_WINDOW})
                       THEN 0 ELSE 1 END,
                  last_idx - 500 + 1 + g.i * 100) AS INT) AS queue_pos
    FROM bounds, generate_series(0, 9) g(i)
    """,
)
def enqueue_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue filling with the reference's forward-priority policy
    (orchestrator.js:29-31 BACKFILL_MODE/BACKFILL_WINDOW and the
    minAllowedStart filter in launchWorkers): candidate fixed-size
    batches around the indexed tip are tiered — ranges inside the
    recent window (start_height >= max(START_HEIGHT, tip - WINDOW)) get
    priority 0 and enqueue first; older ranges are the backfill tier
    (priority 1), drained only when BACKFILL_MODE allows. queue_pos is
    the resulting launch order (priority, then ascending start).
    Range generation is a sequence explode off one aggregate row plus a
    10-row window — no data shuffle."""
    last = _present(spark, sf_dir).agg(F.max("height").alias("last_idx"))
    ranges = last.select(
        "last_idx", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("batch_idx")
    ).select(
        F.col("batch_idx").cast("int").alias("batch_idx"),
        (F.col("last_idx") - 500 + 1 + F.col("batch_idx") * 100)
        .cast("long")
        .alias("start_height"),
        (F.col("last_idx") - 500 + (F.col("batch_idx") + 1) * 100)
        .cast("long")
        .alias("end_height"),
        F.greatest(
            F.lit(START_HEIGHT).cast("long"),
            (F.col("last_idx") - BACKFILL_WINDOW).cast("long"),
        ).alias("min_allowed_start"),
    )
    tiered = ranges.select(
        "batch_idx",
        "start_height",
        "end_height",
        F.when(F.col("start_height") >= F.col("min_allowed_start"), 0)
        .otherwise(1)
        .cast("int")
        .alias("priority"),
    )
    w = Window.orderBy("priority", "start_height")
    return tiered.withColumn(
        "queue_pos", F.row_number().over(w).cast("int")
    )


# --------------------------------------------------------------------------
# 59. range_completeness (orchestrator.js isRangeComplete)
# --------------------------------------------------------------------------
_COMPLETENESS_ORACLE = f"""
    WITH r AS (SELECT {_RANGE_SQL} FROM orders WHERE o_orderstatus = 'P'),
    present AS (SELECT DISTINCT event_id AS height FROM events),
    expected AS (
      SELECT r.id, r.start_height, r.end_height,
             r.start_height + g.i AS h
      FROM r, generate_series(0, 63) g(i)
      WHERE r.start_height + g.i <= r.end_height
    )
    SELECT e.id, CAST(e.start_height AS BIGINT) AS start_height,
           CAST(e.end_height AS BIGINT) AS end_height,
           CAST(SUM(CASE WHEN p.height IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS missing
    FROM expected e LEFT JOIN present p ON p.height = e.h
    GROUP BY e.id, e.start_height, e.end_height
"""


@register("range_completeness", oracle=_COMPLETENESS_ORACLE)
def range_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isRangeComplete, set-at-once (orchestrator.js): per processing
    range, how many expected heights are missing from the indexed set.
    The per-range series explodes to ≤64 rows each; the membership
    check is one shuffle on height against the present set — the same
    anti-join shape as gap_detection but grouped back per range."""
    r = _ranges(spark, sf_dir, "P")
    present = _present(spark, sf_dir)
    expected = r.select(
        "id",
        "start_height",
        "end_height",
        F.explode(F.sequence(F.col("start_height"), F.col("end_height"))).alias("h"),
    )
    joined = expected.join(present, expected.h == present.height, "left")
    return joined.groupBy("id", "start_height", "end_height").agg(
        F.sum(F.when(F.col("height").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("missing")
    ).select(
        "id",
        F.col("start_height").cast("long").alias("start_height"),
        F.col("end_height").cast("long").alias("end_height"),
        "missing",
    )


# --------------------------------------------------------------------------
# 60. reconcile_processing (orchestrator.js reconcileProcessingItems)
# --------------------------------------------------------------------------
@register(
    "reconcile_processing",
    oracle=f"""
    SELECT id, start_height, end_height FROM ({_COMPLETENESS_ORACLE})
    WHERE missing = 0
    """,
)
def reconcile_processing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lingering 'processing' items whose range is fully indexed — the
    reconciler marks these done (orchestrator.js
    reconcileProcessingItems)."""
    return range_completeness(spark, sf_dir).filter(F.col("missing") == 0).select(
        "id", "start_height", "end_height"
    )


# --------------------------------------------------------------------------
# 61. sync_progress (orchestrator.js getLastIndexedHeight GREATEST logic)
# --------------------------------------------------------------------------
@register(
    "sync_progress",
    oracle="""
    SELECT CAST(GREATEST(
             COALESCE((SELECT MAX(event_id) FROM events WHERE event_type = 'click'), 0),
             COALESCE((SELECT MAX(event_id) FROM events), 0)
           ) AS BIGINT) AS last_idx,
           CAST((SELECT MAX(event_id) FROM events) AS BIGINT) AS max_block,
           CAST((SELECT MAX(event_id) FROM events WHERE event_type = 'click')
                AS BIGINT) AS state_height
    """,
)
def sync_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progress resolution: GREATEST(index_state height, max indexed
    block) with COALESCE fallbacks (orchestrator.js
    getLastIndexedHeight) — keeps the orchestrator from re-queuing
    already-indexed ranges after a state lag."""
    e = load(spark, sf_dir, "events")
    agg = e.agg(
        F.max("event_id").cast("long").alias("max_block"),
        F.max(F.when(F.col("event_type") == "click", F.col("event_id")))
        .cast("long")
        .alias("state_height"),
    )
    return agg.select(
        F.greatest(
            F.coalesce(F.col("state_height"), F.lit(0)),
            F.coalesce(F.col("max_block"), F.lit(0)),
        )
        .cast("long")
        .alias("last_idx"),
        "max_block",
        "state_height",
    )


# --------------------------------------------------------------------------
# 152. seed_subtract_overlaps (orchestrator.js seedWorkQueue/subtractOverlaps)
# --------------------------------------------------------------------------
SEED_CHUNK = 500  # ORCH_ASSIGN_RANGE analog


@register(
    "seed_subtract_overlaps",
    oracle=f"""
    WITH bounds AS (SELECT CAST(MAX(event_id) AS BIGINT) AS hi FROM events),
    chunks AS (
      SELECT CAST(g.i AS BIGINT) AS chunk_id,
             CAST(1 + g.i * {SEED_CHUNK} AS BIGINT) AS cs,
             CAST(LEAST((g.i + 1) * {SEED_CHUNK}, hi) AS BIGINT) AS ce
      FROM bounds, generate_series(0, 1999) g(i)
      WHERE 1 + g.i * {SEED_CHUNK} <= hi
    ),
    existing AS (
      SELECT o_orderkey * 5 AS s,
             o_orderkey * 5 + 4 + (o_custkey % 10) AS e
      FROM orders WHERE o_orderstatus IN ('O', 'P')
    ),
    clipped AS (
      SELECT c.chunk_id, c.cs, c.ce,
             GREATEST(x.s, c.cs) AS os, LEAST(x.e, c.ce) AS oe
      FROM chunks c JOIN existing x ON x.e >= c.cs AND x.s <= c.ce
    ),
    w AS (
      SELECT chunk_id, cs, ce, os, oe,
             MAX(oe) OVER (PARTITION BY chunk_id ORDER BY os, oe
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_end
      FROM clipped
    ),
    gaps AS (
      SELECT chunk_id,
             GREATEST(cs, COALESCE(prev_end + 1, cs)) AS seg_s,
             os - 1 AS seg_e
      FROM w
      WHERE os - 1 >= GREATEST(cs, COALESCE(prev_end + 1, cs))
      UNION ALL
      SELECT chunk_id, MAX(oe) + 1, MAX(ce)
      FROM clipped GROUP BY chunk_id HAVING MAX(oe) + 1 <= MAX(ce)
      UNION ALL
      SELECT c.chunk_id, c.cs, c.ce FROM chunks c
      WHERE NOT EXISTS (SELECT 1 FROM clipped x
                        WHERE x.chunk_id = c.chunk_id)
    )
    SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(seg_s AS BIGINT) AS start_height,
           CAST(seg_e AS BIGINT) AS end_height
    FROM gaps
    """,
)
def seed_subtract_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue seeding with overlap subtraction (orchestrator.js:574-636
    ``seedWorkQueue``/``subtractOverlaps``): the seed span [1, tip] is
    cut into ORCH_ASSIGN_RANGE chunks, and from each chunk every
    existing pending/processing range is subtracted, leaving the
    disjoint segments that actually get enqueued — the reference's
    left/right-remainder loop, set-at-once.

    Spark-first shape: the reference subtracts ranges one at a time in
    a driver loop per chunk; here it's gaps-and-islands — clip each
    existing range to the chunks it touches (sequence explode onto
    chunk ids → equi-join against the broadcast chunk list), then per
    chunk one running-MAX window (prev coverage end) turns the sorted
    overlaps into their complement: a gap row before each overlap that
    clears previous coverage, a tail segment per chunk, and untouched
    chunks pass through whole via a broadcast anti-join. ONE shuffle
    (the per-chunk window); candidate volume is O(ranges · chunks
    touched) with short ranges touching ≤2 chunks — never a range×range
    or chunk×range cross product."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(F.max("event_id").cast("long").alias("hi"))
    chunks = (
        bounds.select(
            "hi",
            F.explode(
                F.sequence(
                    F.lit(0), F.floor((F.col("hi") - 1) / SEED_CHUNK)
                )
            ).alias("chunk_id"),
        )
        .select(
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (1 + F.col("chunk_id") * SEED_CHUNK).cast("long").alias("cs"),
            F.least(
                (F.col("chunk_id") + 1) * SEED_CHUNK, F.col("hi")
            ).cast("long").alias("ce"),
        )
    )
    existing = _ranges(spark, sf_dir, "O").unionAll(
        _ranges(spark, sf_dir, "P")
    ).select("start_height", "end_height")
    # explode each range onto the chunk ids it touches -> equi-join
    spanned = existing.select(
        "start_height",
        "end_height",
        F.explode(
            F.sequence(
                F.floor((F.col("start_height") - 1) / SEED_CHUNK),
                F.floor((F.col("end_height") - 1) / SEED_CHUNK),
            )
        ).alias("chunk_id"),
    )
    clipped = spanned.join(F.broadcast(chunks), "chunk_id").select(
        "chunk_id", "cs", "ce",
        F.greatest(F.col("start_height"), F.col("cs")).alias("os"),
        F.least(F.col("end_height"), F.col("ce")).alias("oe"),
    ).filter(F.col("os") <= F.col("oe"))
    # ONE window pass emits both segment kinds: the three windows share
    # the chunk_id partitioning, so Catalyst plans a single Exchange
    # (and clipped has a single consumer — no triple recompute of the
    # upstream scan+join)
    w_prev = (
        Window.partitionBy("chunk_id")
        .orderBy("os", "oe")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("chunk_id")
    w_last = Window.partitionBy("chunk_id").orderBy(
        F.col("os").desc(), F.col("oe").desc()
    )
    annotated = clipped.select(
        "chunk_id", "cs", "ce", "os", "oe",
        F.max("oe").over(w_prev).alias("prev_end"),
        F.max("oe").over(w_all).alias("chunk_max_end"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    seg_s = F.greatest(F.col("cs"), F.coalesce(F.col("prev_end") + 1, F.col("cs")))
    gap = F.when(
        F.col("os") - 1 >= seg_s,
        F.struct(seg_s.alias("s"), (F.col("os") - 1).alias("e")),
    )
    tail = F.when(
        (F.col("rn_last") == 1) & (F.col("chunk_max_end") < F.col("ce")),
        F.struct(
            (F.col("chunk_max_end") + 1).alias("s"), F.col("ce").alias("e")
        ),
    )
    covered_gaps = annotated.select(
        "chunk_id",
        F.explode(F.array_compact(F.array(gap, tail))).alias("seg"),
    ).select("chunk_id", F.col("seg.s").alias("start_height"),
             F.col("seg.e").alias("end_height"))
    # chunks no existing range touches pass through whole; the probe
    # side re-derives only the cheap scan+explode (no join), and the
    # anti-join is broadcast
    untouched = chunks.join(
        spanned.select("chunk_id").distinct(), "chunk_id", "left_anti"
    ).select(
        "chunk_id",
        F.col("cs").alias("start_height"),
        F.col("ce").alias("end_height"),
    )
    return (
        covered_gaps.unionAll(untouched)
        .select(
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("start_height").cast("long").alias("start_height"),
            F.col("end_height").cast("long").alias("end_height"),
        )
    )
