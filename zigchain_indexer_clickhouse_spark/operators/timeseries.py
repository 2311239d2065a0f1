"""ClickHouse time-series function analogs (SURVEY.md §2.2 #165-167):
``largestTriangleThreeBuckets`` downsampling, ``deltaSum`` counter
aggregation, and ``exponentialMovingAverage`` smoothing.

Reference provenance: these are the ClickHouse function surface a user
of the reference stack reaches for when charting indexer metrics
(monitor_indexer.js renders queue/height trends from raw scans; CH
users downsample those series with largestTriangleThreeBuckets and
smooth them with exponentialMovingAverage).

Spark-first redesigns, all integer-exact so the DuckDB oracle replays
bit-for-bit:

- LTTB is classically SEQUENTIAL (each bucket's pick depends on the
  previously picked point). The parallel redesign replaces "previously
  selected point" with the neighbor bucket AVERAGES on both sides — the
  well-known streaming/parallel LTTB variant — which makes every
  bucket's argmax independent: a per-bucket window over the points,
  with the 20-row bucket-average table broadcast. Time-based buckets
  (not row-number buckets) so no global sort ever happens.
- ``deltaSum`` (sum of positive deltas of an ordered gauge, i.e.
  counter-reset-aware rate) is one per-key window + one per-key
  aggregate on the same key — a single exchange.
- ``exponentialMovingAverage`` has an order-dependent recurrence;
  power-weight expansion over an UNBOUNDED window overflows. The scale
  shape: roll up to (key, day) first — the only pass that touches raw
  data — then expand each day's mean into its ≤11 future-day
  contributions with integer weights 2^(10-lag) (a truncated
  half-life-one-day EMA) and re-aggregate. The heavy scan is one keyed
  agg; the EMA itself runs on the tiny rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

# LTTB bucket count (the chart width the reference's monitor page
# would render).
LTTB_B = 20
# EMA truncation window in days: weights 2^(10-lag), lag 0..10 — one
# doubling per day, contributions below 2^0 dropped.
EMA_W = 10


# --------------------------------------------------------------------------
# 165. lttb_downsample — largestTriangleThreeBuckets, parallel variant
# --------------------------------------------------------------------------
@register(
    "lttb_downsample",
    oracle=f"""
    WITH pts AS (
      SELECT event_id, ts, epoch_us(ts) AS xabs,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    bounds AS (
      SELECT MIN(xabs) AS xmin,
             GREATEST(MAX(xabs) - MIN(xabs), 1) AS span
      FROM pts
    ),
    pb AS (
      SELECT event_id, ts, xabs - xmin AS rx, y,
             CAST(LEAST(((xabs - xmin) * {LTTB_B}) // span,
                        {LTTB_B - 1}) AS INT) AS bucket
      FROM pts, bounds
    ),
    bs AS (
      SELECT bucket,
             CAST(SUM(rx) AS BIGINT) // COUNT(*) AS ax,
             CAST(SUM(y) AS BIGINT) // COUNT(*) AS ay
      FROM pb GROUP BY bucket
    ),
    nb AS (
      SELECT bucket,
             LAG(ax)  OVER (ORDER BY bucket) AS axp,
             LAG(ay)  OVER (ORDER BY bucket) AS ayp,
             LEAD(ax) OVER (ORDER BY bucket) AS axn,
             LEAD(ay) OVER (ORDER BY bucket) AS ayn
      FROM bs
    ),
    ranked AS (
      SELECT p.bucket, p.ts, p.y, p.event_id,
             ROW_NUMBER() OVER (
               PARTITION BY p.bucket
               ORDER BY
                 CASE WHEN n.axp IS NULL THEN p.rx
                      WHEN n.axn IS NULL THEN -p.rx
                      ELSE -abs((n.axp - n.axn) * (p.y - n.ayp)
                                - (n.axp - p.rx) * (n.ayn - n.ayp))
                 END,
                 p.ts, p.event_id
             ) AS rn
      FROM pb p JOIN nb n USING (bucket)
    )
    SELECT bucket, ts, CAST(y AS BIGINT) AS value_c, event_id
    FROM ranked WHERE rn = 1
    """,
)
def lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets({LTTB_B})`` over the
    events series — pick, per time bucket, the point forming the
    largest triangle with the NEIGHBOR BUCKET AVERAGES (the parallel
    LTTB variant: classic LTTB anchors on the previously *selected*
    point, a sequential dependency; anchoring on bucket averages makes
    every bucket independent and is the standard streaming
    formulation). First/last buckets anchor the series endpoints
    (earliest / latest point), as classic LTTB does.

    Integer-exact: x is epoch-micros RELATIVE to the series start (so
    bucket sums stay far inside long even at 100 TB row counts), y is
    value cents; the 2×triangle-area cross product is pure long
    arithmetic, so the DuckDB oracle replays it bit-for-bit.

    Scale shape: bounds = one 1-row agg (broadcast); bucket averages =
    one {LTTB_B}-row agg whose lag/lead window runs on {LTTB_B} rows
    (single-partition window over the TINY rollup only, never the
    data); the per-bucket argmax is ROW_NUMBER over the bucket key —
    one shuffle of (bucket, rx, y) triples. No global sort: buckets
    are TIME-based, not row-number-based."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        "ts",
        F.unix_micros("ts").alias("xabs"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    bounds = pts.agg(
        F.min("xabs").alias("xmin"),
        F.greatest(F.max("xabs") - F.min("xabs"), F.lit(1)).alias("span"),
    )
    pb = (
        pts.crossJoin(F.broadcast(bounds))
        .withColumn("rx", F.col("xabs") - F.col("xmin"))
        .withColumn(
            "bucket",
            F.least(
                F.expr(f"(rx * {LTTB_B}) div span"), F.lit(LTTB_B - 1)
            ).cast("int"),
        )
        .select("event_id", "ts", "rx", "y", "bucket")
    )
    bs = pb.groupBy("bucket").agg(
        F.expr("sum(rx) div count(*)").alias("ax"),
        F.expr("sum(y) div count(*)").alias("ay"),
    )
    wb = Window.orderBy("bucket")  # LTTB_B rows — tiny by construction
    nb = bs.select(
        "bucket",
        F.lag("ax").over(wb).alias("axp"),
        F.lag("ay").over(wb).alias("ayp"),
        F.lead("ax").over(wb).alias("axn"),
        F.lead("ay").over(wb).alias("ayn"),
    )
    area2 = F.abs(
        (F.col("axp") - F.col("axn")) * (F.col("y") - F.col("ayp"))
        - (F.col("axp") - F.col("rx")) * (F.col("ayn") - F.col("ayp"))
    )
    sortv = (
        F.when(F.col("axp").isNull(), F.col("rx"))
        .when(F.col("axn").isNull(), -F.col("rx"))
        .otherwise(-area2)
    )
    wr = Window.partitionBy("bucket").orderBy(sortv, "ts", "event_id")
    return (
        pb.join(F.broadcast(nb), "bucket")
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("bucket", "ts", F.col("y").alias("value_c"), "event_id")
    )


# --------------------------------------------------------------------------
# 166. delta_sum_counter — ClickHouse deltaSum(): counter-reset-aware sum
# --------------------------------------------------------------------------
@register(
    "delta_sum_counter",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    d AS (
      SELECT user_id,
             y - LAG(y) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS delta
      FROM v
    )
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN delta > 0 THEN delta END), 0)
                AS BIGINT) AS delta_sum,
           CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_resets,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM d GROUP BY user_id
    """,
)
def delta_sum_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum`` per user: treat the value series as a
    gauge read in (ts, event_id) order and sum only the POSITIVE
    deltas — negative steps are counter resets, counted separately
    (the PromQL ``increase()`` / CH ``deltaSum`` semantics the
    reference's monitor page needs for cumulative RPC counters).

    One exchange total: the lag window and the final aggregate share
    the user_id key, so the groupBy reuses the window's hash
    partitioning. Integer cents end-to-end."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.withColumn("delta", F.col("y") - F.lag("y").over(w))
    return d.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("delta") > 0, F.col("delta"))), F.lit(0)
        )
        .cast("long")
        .alias("delta_sum"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_resets"),
        F.count("*").cast("long").alias("n_events"),
    )


# --------------------------------------------------------------------------
# 167. ema_time_decay — ClickHouse exponentialMovingAverage analog
# --------------------------------------------------------------------------
@register(
    "ema_time_decay",
    oracle=f"""
    WITH b AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             date_diff('day', DATE '1992-01-01', CAST(ts AS DATE))
               AS day_idx,
             (CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                * 1000) // COUNT(*) AS mean_m
      FROM events GROUP BY 1, 2, 3
    )
    SELECT t.event_type, t.day,
           CAST(SUM(s.mean_m
                    * (1 << ({EMA_W} - (t.day_idx - s.day_idx))))
                // SUM(1 << ({EMA_W} - (t.day_idx - s.day_idx)))
                AS BIGINT) AS ema_m,
           CAST(COUNT(*) AS INT) AS n_src
    FROM b t JOIN b s
      ON s.event_type = t.event_type
     AND t.day_idx - s.day_idx BETWEEN 0 AND {EMA_W}
    GROUP BY t.event_type, t.day
    """,
)
def ema_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage`` per event_type: smooth
    the daily mean value (milli-cents) with half-life-one-day weights
    2^({EMA_W}-lag), truncated at {EMA_W} days (the EMA recurrence is
    order-dependent; truncated integer power weights make it an exact,
    order-free aggregate the DuckDB oracle replays bit-for-bit —
    unbounded power expansion would overflow).

    Scale shape: the ONLY pass over raw data is one (event_type, day)
    keyed aggregate; the EMA itself runs on the tiny rollup. Each
    rollup row explodes into its ≤{EMA_W}+1 forward contributions
    (expression-land sequence, no range join, no window over the raw
    stream), re-aggregated on (event_type, target-day) and inner-joined
    back to the rollup so only days that exist emit a row — the exact
    equi-join rewrite of the oracle's bounded-range self-join."""
    e = load(spark, sf_dir, "events")
    b = (
        e.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_c"),
            F.count("*").alias("cnt"),
        )
        .withColumn("day_idx", F.datediff("day", F.lit("1992-01-01")))
        .withColumn("mean_m", F.expr("(sum_c * 1000) div cnt"))
        .select("event_type", "day", "day_idx", "mean_m")
    )
    contrib = (
        b.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(EMA_W))))
        .select(
            "event_type",
            (F.col("day_idx") + F.col("k")).alias("tgt"),
            (
                F.col("mean_m")
                * F.expr(f"cast(shiftleft(1, {EMA_W} - k) as bigint)")
            ).alias("c"),
            F.expr(f"cast(shiftleft(1, {EMA_W} - k) as bigint)").alias("w"),
        )
        .groupBy("event_type", "tgt")
        .agg(
            F.sum("c").alias("sum_c"),
            F.sum("w").alias("sum_w"),
            F.count("*").cast("int").alias("n_src"),
        )
    )
    days = b.select(
        F.col("event_type").alias("bt"),
        "day",
        F.col("day_idx").alias("bidx"),
    )
    return (
        contrib.join(
            days,
            (contrib["event_type"] == days["bt"])
            & (contrib["tgt"] == days["bidx"]),
        )
        .select(
            "event_type",
            "day",
            F.expr("sum_c div sum_w").alias("ema_m"),
            "n_src",
        )
    )


# --------------------------------------------------------------------------
# 182. mad_outlier_bounds — median/MAD robust outlier detection
# --------------------------------------------------------------------------
@register(
    "mad_outlier_bounds",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    g1 AS (
      SELECT event_type, y, COUNT(*) AS w FROM v GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type,
             MIN(CASE WHEN cumw * 2 >= totw THEN y END) AS med_c
      FROM (
        SELECT event_type, y,
               SUM(w) OVER (PARTITION BY event_type ORDER BY y
                            ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(w) OVER (PARTITION BY event_type) AS totw
        FROM g1
      ) GROUP BY event_type
    ),
    d AS (
      SELECT v.event_type, abs(v.y - m.med_c) AS ad, m.med_c
      FROM v JOIN med m USING (event_type)
    ),
    g2 AS (
      SELECT event_type, med_c, ad, COUNT(*) AS w FROM d GROUP BY 1, 2, 3
    ),
    mad AS (
      SELECT event_type, med_c,
             MIN(CASE WHEN cumw * 2 >= totw THEN ad END) AS mad_c
      FROM (
        SELECT event_type, med_c, ad,
               SUM(w) OVER (PARTITION BY event_type ORDER BY ad
                            ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(w) OVER (PARTITION BY event_type) AS totw
        FROM g2
      ) GROUP BY event_type, med_c
    )
    SELECT m.event_type,
           CAST(m.med_c AS BIGINT) AS med_c,
           CAST(m.mad_c AS BIGINT) AS mad_c,
           CAST(m.med_c - 5 * m.mad_c AS BIGINT) AS lo_c,
           CAST(m.med_c + 5 * m.mad_c AS BIGINT) AS hi_c,
           CAST(SUM(CASE WHEN v.y < m.med_c - 5 * m.mad_c
                          OR v.y > m.med_c + 5 * m.mad_c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM v JOIN mad m USING (event_type)
    GROUP BY m.event_type, m.med_c, m.mad_c
    """,
)
def mad_outlier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event_type: exact MEDIAN and MAD
    (median absolute deviation) of value cents, ±5·MAD alert bounds,
    and the outlier count — the monitoring alert the reference's
    health page would fire on anomalous gas/value readings, done
    robustly (mean/stddev move with the outliers they hunt; median/MAD
    do not).

    Exactness the quantile_exact_weighted way, applied TWICE: each
    median collapses duplicates into (key, value, weight) rows first —
    both cumsum windows run over distinct cent values, not events —
    then the deviation pass re-scans with the per-key median joined
    back (a broadcast: one row per event_type). All integer compares;
    the oracle replays every floor and tie rule bit-for-bit."""
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("y")
    )

    def exact_median(df: DataFrame, col: str) -> DataFrame:
        g = df.groupBy("event_type", col).agg(F.count("*").alias("w"))
        wc = (
            Window.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy("event_type")
        c = g.withColumn("cumw", F.sum("w").over(wc)).withColumn(
            "totw", F.sum("w").over(wt)
        )
        return c.groupBy("event_type").agg(
            F.min(
                F.when(F.col("cumw") * 2 >= F.col("totw"), F.col(col))
            ).alias(f"med_{col}")
        )

    med = exact_median(v, "y").withColumnRenamed("med_y", "med_c")
    d = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "y",
        "med_c",
        F.abs(F.col("y") - F.col("med_c")).alias("ad"),
    )
    mad = (
        exact_median(d.select("event_type", "ad"), "ad")
        .withColumnRenamed("med_ad", "mad_c")
    )
    bounds = med.join(mad, "event_type").select(
        "event_type",
        "med_c",
        "mad_c",
        (F.col("med_c") - 5 * F.col("mad_c")).alias("lo_c"),
        (F.col("med_c") + 5 * F.col("mad_c")).alias("hi_c"),
    )
    return (
        v.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "med_c", "mad_c", "lo_c", "hi_c")
        .agg(
            F.sum(
                (
                    (F.col("y") < F.col("lo_c"))
                    | (F.col("y") > F.col("hi_c"))
                ).cast("long")
            ).alias("n_outliers")
        )
        .select(
            "event_type", "med_c", "mad_c", "lo_c", "hi_c", "n_outliers"
        )
    )


# --------------------------------------------------------------------------
# 183. time_weighted_avg — duration-weighted gauge average per user
# --------------------------------------------------------------------------
@register(
    "time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS x, event_id,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    d AS (
      SELECT user_id, y,
             LEAD(x) OVER (PARTITION BY user_id ORDER BY x, event_id)
               - x AS dur
      FROM s
    )
    SELECT user_id,
           CAST(SUM(y * dur) // SUM(dur) AS BIGINT) AS twa_c,
           CAST(SUM(dur) AS BIGINT) AS span_us,
           CAST(COUNT(*) AS BIGINT) AS n_holds
    FROM d WHERE dur IS NOT NULL GROUP BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted gauge average per user: each reading holds until
    the next one, so its weight is the HOLD DURATION, not 1 — the
    correct average for sampled gauges read at irregular intervals
    (a plain avg over-weights bursts; this is PromQL's avg_over_time
    on an irregular series / CH's timeSeries* aggregation concern).
    The final (open-ended) reading carries no duration and drops out,
    on both engines.

    One exchange: the lead window and the aggregate share the user_id
    partitioning. Integer micros × cents products stay far inside
    long; floor division replayed by the oracle."""
    e = load(spark, sf_dir, "events")
    s = e.select(
        "user_id",
        F.unix_micros("ts").alias("x"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("x", "event_id")
    d = s.withColumn("dur", F.lead("x").over(w) - F.col("x")).filter(
        F.col("dur").isNotNull()
    )
    return d.groupBy("user_id").agg(
        F.expr("sum(y * dur) div sum(dur)").alias("twa_c"),
        F.sum("dur").cast("long").alias("span_us"),
        F.count("*").cast("long").alias("n_holds"),
    )
