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


def _ranges_all(
    spark: SparkSession, sf_dir: str, statuses: list[str]
) -> DataFrame:
    """Multi-status work ranges with the status projected as a column —
    ONE scan of the queue table where composing per-status `_ranges`
    calls would issue one filtered scan per status plus a union."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin(*statuses)
    )
    return o.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") * 5).alias("start_height"),
        (F.col("o_orderkey") * 5 + 4 + F.col("o_custkey") % 10).alias("end_height"),
        F.col("o_orderdate").alias("updated_at"),
        F.col("o_orderstatus").alias("st"),
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
      FROM bounds, generate_series(0, 199999) g(i)
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
    existing = _ranges_all(spark, sf_dir, ["O", "P"]).select(
        "start_height", "end_height"
    )
    return _subtract_ranges(chunks, existing)


def _subtract_ranges(chunks: DataFrame, existing: DataFrame) -> DataFrame:
    """Subtract every existing range from each seed chunk, emitting the
    disjoint complement segments (chunks: chunk_id/cs/ce with the last
    ce tip-clamped; existing: start_height/end_height). Factored out so
    edge states the sf data never produces (a range landing on the
    clamped last chunk but starting beyond the tip) are testable."""
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
    # chunks no existing range OVERLAPS pass through whole. The probe
    # must be the post-clip candidate set, not `spanned`: a range whose
    # nominal chunk arithmetic lands on the tip-clamped last chunk but
    # whose span starts beyond the tip (os > oe, dropped from clipped)
    # would otherwise mark that chunk touched and swallow its seed
    # segment entirely
    untouched = chunks.join(
        clipped.select("chunk_id").distinct(), "chunk_id", "left_anti"
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


# --------------------------------------------------------------------------
# 153. gap_backfill_window (orchestrator.js:245-291 detectAndFillGaps)
# --------------------------------------------------------------------------
GAP_STRIPE = 65536  # heights per island-stripe (distributed gaps-and-islands)


@register(
    "gap_backfill_window",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT o_orderkey AS h FROM orders WHERE o_orderstatus <> 'O'
    ),
    bounds AS (SELECT CAST(MAX(o_orderkey) AS BIGINT) AS hmax FROM orders),
    aug AS (
      SELECT h FROM pres
      UNION ALL SELECT CAST(-1 AS BIGINT)
      UNION ALL SELECT hmax + 1 FROM bounds
    ),
    nxt AS (SELECT h AS p, LEAD(h) OVER (ORDER BY h) AS np FROM aug),
    gap_ranges AS (
      SELECT p + 1 AS s, np - 1 AS e FROM nxt WHERE np > p + 1
    ),
    caps AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN o_orderstatus IN ('O', 'P') THEN 1 ELSE 0 END)
               AS queued
      FROM orders
    ),
    win AS (
      SELECT GREATEST(0, hmax - CAST(FLOOR(hmax / 2) AS BIGINT)) AS min_start
      FROM bounds
    )
    SELECT CAST(g.s AS BIGINT) AS start_height,
           CAST(g.e AS BIGINT) AS end_height
    FROM gap_ranges g, caps c, win w
    WHERE c.queued < 0.8 * c.total AND g.e >= w.min_start
    """,
)
def gap_backfill_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """detectAndFillGaps with its two admission gates
    (orchestrator.js:245-291): contiguous missing-height ranges are
    queued only when (a) the work queue is under 80% of capacity
    (orchestrator.js:255-262 queueCount >= maxQueueItems*0.8 -> skip)
    and (b) the range's end reaches into the backfill window,
    end >= max(START_HEIGHT, max_height - BACKFILL_WINDOW)
    (orchestrator.js:264-271; ranges entirely below the window wait for
    an explicit backfill run). Capacity is modeled as the queue table
    size and the window as half the chain, so both gates stay exercised
    and deterministic at every SF.

    Spark-first shape: missing ranges come from the PRESENT set, not
    the expected series — each present height emits a gap iff its
    successor is not adjacent, so island detection is one window over
    present heights instead of an anti-join over the (mostly-missing)
    dense domain. The window is partitioned by height stripe
    (floor(h/65536)): in-stripe successors come from lead(), and each
    stripe's last gap closes against the next non-empty stripe's first
    height, carried by a tiny per-stripe summary (n_stripes rows)
    broadcast back — no global single-partition sort at any scale. The
    two gate scalars ride in as 1-row broadcast cross joins."""
    o = load(spark, sf_dir, "orders")
    pres = (
        o.filter(F.col("o_orderstatus") != "O")
        .select(F.col("o_orderkey").cast("long").alias("h"))
        .distinct()
    )
    bounds = o.agg(F.max("o_orderkey").cast("long").alias("hmax"))
    gap_ranges = _missing_islands(pres, bounds)
    caps = o.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "P"), 1).otherwise(0))
        .alias("queued"),
    )
    win = bounds.select(
        F.greatest(F.lit(0).cast("long"),
                   F.col("hmax") - F.floor(F.col("hmax") / 2).cast("long"))
        .alias("min_start")
    )
    return _admit_gap_ranges(gap_ranges, caps, win)


def _missing_islands(
    pres: DataFrame, bounds: DataFrame, stripe: int = GAP_STRIPE
) -> DataFrame:
    """Contiguous missing-height ranges over [0, hmax] from the PRESENT
    set (pres: column h; bounds: 1 row, hmax): each present height
    opens a gap iff its successor is not adjacent. The successor window
    is partitioned by height stripe so no global sort exists at any
    scale; each stripe's last element closes against the next non-empty
    stripe's first height via a broadcast n_stripes-row summary.
    `stripe` is injectable so tests can force multi-stripe layouts the
    sf data never produces."""
    # sentinels: -1 opens the leading gap at 0; hmax+1 closes the tail
    aug = pres.unionAll(
        bounds.select(F.explode(F.array(F.lit(-1).cast("long"),
                                        F.col("hmax") + 1)).alias("h"))
    ).withColumn("stripe", F.floor((F.col("h") + 1) / stripe))
    in_stripe = aug.withColumn(
        "np",
        F.lead("h").over(Window.partitionBy("stripe").orderBy("h")),
    )
    # stripe summary: first height per stripe -> next non-empty stripe's
    # first height closes the previous stripe's dangling last gap
    stripes = aug.groupBy("stripe").agg(F.min("h").alias("first_h"))
    stripes = stripes.withColumn(
        "next_first", F.lead("first_h").over(Window.orderBy("stripe"))
    )
    closed = in_stripe.join(F.broadcast(stripes.select("stripe", "next_first")),
                            "stripe").select(
        "h", F.coalesce("np", "next_first").alias("np")
    )
    return closed.filter(F.col("np") > F.col("h") + 1).select(
        (F.col("h") + 1).alias("start_height"),
        (F.col("np") - 1).alias("end_height"),
    )


def _admit_gap_ranges(
    gap_ranges: DataFrame, caps: DataFrame, win: DataFrame
) -> DataFrame:
    """Apply detectAndFillGaps' two admission gates to candidate gap
    ranges: queue under 80% capacity (caps: 1 row, total/queued) and
    range end inside the backfill window (win: 1 row, min_start)."""
    return (
        gap_ranges.crossJoin(F.broadcast(caps))
        .crossJoin(F.broadcast(win))
        .filter((F.col("queued") < 0.8 * F.col("total"))
                & (F.col("end_height") >= F.col("min_start")))
        .select(
            F.col("start_height").cast("long").alias("start_height"),
            F.col("end_height").cast("long").alias("end_height"),
        )
    )


# --------------------------------------------------------------------------
# 154. queue_cleanup (orchestrator.js:296-345 cleanupOldWorkQueue)
# --------------------------------------------------------------------------
FAILED_CUTOFF = "1997-01-01"  # "one hour ago" analog, mid-span -> SF-stable


@register(
    "queue_cleanup",
    oracle=f"""
    WITH q AS (
      SELECT o_orderkey AS id, o_orderstatus AS st, o_orderdate AS upd,
             {_RANGE_SQL.replace('o_orderkey AS id, ', '')}
      FROM orders
    ),
    requeued AS (
      SELECT id,
             CASE WHEN st = 'F' AND upd < DATE '{FAILED_CUTOFF}'
                  THEN 'O' ELSE st END AS st,
             start_height, end_height
      FROM q
    ),
    bounds AS (SELECT MAX(end_height) AS max_h FROM q),
    caps AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN st IN ('O', 'P') THEN 1 ELSE 0 END) AS queued
      FROM requeued
    ),
    survivors AS (
      SELECT r.* FROM requeued r, bounds b, caps c
      WHERE NOT (c.queued > 0.10 * c.total
                 AND r.st = 'O'
                 AND r.end_height < b.max_h
                                    - CAST(FLOOR(b.max_h / 2) AS BIGINT))
    )
    SELECT st AS status, COUNT(*) AS n_items,
           CAST(MIN(start_height) AS BIGINT) AS min_start,
           CAST(MAX(end_height) AS BIGINT) AS max_end
    FROM survivors GROUP BY st
    """,
)
def queue_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cleanupOldWorkQueue, set-at-once (orchestrator.js:296-345): old
    failed items (updated before the cutoff — the reference's "one hour
    ago") are deleted from 'failed' and re-queued as 'pending' in one
    status transition (the SELECT -> ALTER DELETE -> re-insert loop at
    orchestrator.js:299-322), then, when the queue is over capacity,
    pending items that fell entirely below the backfill window
    (end_height < max_height - BACKFILL_WINDOW) are dropped
    (orchestrator.js:325-341). Returns the post-cleanup queue summary
    per status. The capacity and window constants are modeled relative
    to the queue/chain size (10% cap -> the drop branch is exercised,
    window = half the chain) so the result is deterministic at every SF.

    Spark-first shape: both transitions are column expressions over one
    queue scan — the failed->pending requeue is a CASE projection, the
    over-capacity drop is a filter against two 1-row broadcast scalars
    (bounds, caps); one final map-side-combinable agg on status. No
    per-row driver loop (the reference re-inserts row by row)."""
    q = _ranges_all(spark, sf_dir, ["O", "P", "F"])
    requeued = q.select(
        "start_height", "end_height",
        F.when(
            (F.col("st") == "F")
            & (F.col("updated_at") < F.lit(FAILED_CUTOFF).cast("date")),
            "O",
        ).otherwise(F.col("st")).alias("st"),
    )
    bounds = q.agg(F.max("end_height").alias("max_h"))
    caps = requeued.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("st").isin("O", "P"), 1).otherwise(0))
        .alias("queued"),
    )
    survivors = (
        requeued.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(caps))
        .filter(
            ~(
                (F.col("queued") > 0.10 * F.col("total"))
                & (F.col("st") == "O")
                & (F.col("end_height")
                   < F.col("max_h") - F.floor(F.col("max_h") / 2).cast("long"))
            )
        )
    )
    return survivors.groupBy(F.col("st").alias("status")).agg(
        F.count("*").alias("n_items"),
        F.min("start_height").cast("long").alias("min_start"),
        F.max("end_height").cast("long").alias("max_end"),
    )


# --------------------------------------------------------------------------
# 155. orchestrator_tick (orchestrator.js:443-505 mainLoop)
# --------------------------------------------------------------------------
ASSIGN_RANGE = 1000  # ORCH_ASSIGN_RANGE default (orchestrator.js:491)
NUM_WORKERS = 5  # NUM_WORKERS default (orchestrator.js:492)
TIP_LEAD = 5000  # modeled chain tip: indexer trails the chain by this
TARGET_LEAD = 2000  # modeled TARGET_MAX_HEIGHT: tip clamp below the lead


@register(
    "orchestrator_tick",
    oracle=f"""
    WITH counts AS (
      SELECT SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS pending,
             SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS processing,
             COUNT(*) AS cap
      FROM orders
    ),
    heights AS (
      SELECT CAST(GREATEST(
               COALESCE(MAX(CASE WHEN event_type = 'click'
                                 THEN event_id END), 0),
               COALESCE(MAX(event_id), 0)) AS BIGINT) AS last_indexed,
             CAST(COALESCE(MAX(event_id), 0) AS BIGINT) AS max_block
      FROM events
    ),
    tick AS (
      SELECT CAST(c.pending AS BIGINT) AS pending,
             CAST(c.processing AS BIGINT) AS processing,
             CAST(FLOOR(c.cap * 2 * 0.8) AS BIGINT) AS capacity_threshold,
             h.last_indexed,
             LEAST(h.max_block + {TIP_LEAD},
                   h.max_block + {TARGET_LEAD}) AS sync_target,
             h.max_block,
             c.pending + c.processing AS total
      FROM counts c, heights h
    ),
    decided AS (
      SELECT *,
             CASE WHEN total = 0 AND max_block >= sync_target THEN 'finalize'
                  WHEN total = 0 AND processing > 0 THEN 'reconcile'
                  WHEN total < capacity_threshold
                       AND last_indexed < sync_target THEN 'seed'
                  ELSE 'idle' END AS decision
      FROM tick
    )
    SELECT pending, processing, capacity_threshold, last_indexed,
           sync_target, decision,
           CASE WHEN decision = 'seed'
                THEN last_indexed + 1 END AS seed_start,
           CASE WHEN decision = 'seed'
                THEN LEAST(last_indexed + {ASSIGN_RANGE} * {NUM_WORKERS},
                           sync_target) END AS seed_end
    FROM decided
    """,
)
def orchestrator_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One main-loop decision tick (orchestrator.js:443-505): resolve
    queue load (pending+processing vs the 80%-of-MAX_QUEUE_ITEMS
    capacity threshold, orchestrator.js:453-462), sync progress
    (getLastIndexedHeight's GREATEST(state, max block)) and the clamped
    sync target (getSyncTargetHeight = LEAST(chain tip,
    TARGET_MAX_HEIGHT), orchestrator.js:68-76), then emit the branch
    the loop would take: 'finalize' (target reached, queue drained,
    orchestrator.js:465-471), 'reconcile' (lingering processing rows
    with no workers, :474-476), 'seed' with the window
    [last_indexed+1, min(last+ASSIGN_RANGE*NUM_WORKERS, target)]
    (:486-495), else 'idle'. Chain tip and TARGET_MAX_HEIGHT are
    modeled as fixed leads over the indexed tip; capacity as 2x the
    queue table -> the tick lands on 'seed' deterministically at every
    SF while every branch predicate stays live (unit-covered with
    injected scalars).

    Scale: the whole tick is two map-side-combinable single-row
    aggregates (queue counts, height resolve) joined by one 1-row
    cross join — the policy runs as a query, no driver round-trips."""
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    counts = o.agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .alias("pending"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
        .alias("processing"),
        F.count("*").alias("cap"),
    )
    # the GREATEST resolve mirrors getLastIndexedHeight's formula over
    # the two reference sources (index_state height vs max block). In
    # this data model the "state" arm is a filtered subset of the same
    # column, so max_block always wins here — the formula (and its
    # oracle twin) is kept literal anyway so the policy matches the
    # reference line-for-line; sync_progress (#26e) models the same
    # resolve and documents the same caveat.
    heights = e.agg(
        F.greatest(
            F.coalesce(
                F.max(F.when(F.col("event_type") == "click",
                             F.col("event_id"))), F.lit(0)),
            F.coalesce(F.max("event_id"), F.lit(0)),
        ).cast("long").alias("last_indexed"),
        F.coalesce(F.max("event_id"), F.lit(0)).cast("long")
        .alias("max_block"),
    )
    tick = counts.crossJoin(F.broadcast(heights)).select(
        F.col("pending").cast("long").alias("pending"),
        F.col("processing").cast("long").alias("processing"),
        F.floor(F.col("cap") * 2 * 0.8).cast("long")
        .alias("capacity_threshold"),
        "last_indexed",
        F.least(F.col("max_block") + TIP_LEAD,
                F.col("max_block") + TARGET_LEAD).alias("sync_target"),
        "max_block",
        (F.col("pending") + F.col("processing")).cast("long").alias("total"),
    )
    return _tick_decision(tick)


def _tick_decision(tick: DataFrame) -> DataFrame:
    """mainLoop's branch resolution over a 1-row tick state (columns:
    pending, processing, capacity_threshold, last_indexed, sync_target,
    max_block, total) — factored out so every branch is unit-testable
    with injected scalars."""
    seeding = (F.col("total") < F.col("capacity_threshold")) & (
        F.col("last_indexed") < F.col("sync_target")
    )
    decided = tick.withColumn(
        "decision",
        F.when((F.col("total") == 0)
               & (F.col("max_block") >= F.col("sync_target")), "finalize")
        .when((F.col("total") == 0) & (F.col("processing") > 0), "reconcile")
        .when(seeding, "seed")
        .otherwise("idle"),
    )
    seeds = F.col("decision") == "seed"
    return decided.select(
        "pending", "processing", "capacity_threshold", "last_indexed",
        "sync_target", "decision",
        F.when(seeds, F.col("last_indexed") + 1).alias("seed_start"),
        F.when(
            seeds,
            F.least(F.col("last_indexed") + ASSIGN_RANGE * NUM_WORKERS,
                    F.col("sync_target")),
        ).alias("seed_end"),
    )
