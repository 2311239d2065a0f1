"""Statistical-test aggregate analogs (SURVEY.md §2.2 growth, round 6):
the ClickHouse statistics function family — rank tests, distribution
tests, correlation, regression, and classifier evaluation — each as
ONE aggregate-shaped query, the way CH serves them.

- ``mann_whitney_u_pairs`` (#208): CH ``mannWhitneyUTest`` — the
  rank-sum U statistic of event value between every event-type pair.
- ``ks_test_pairs`` (#209): CH ``kolmogorovSmirnovTest`` — the max
  CDF-distance D between every event-type pair's value distribution.
- ``spearman_rank_corr`` (#210): CH ``rankCorr`` — Spearman rho
  between per-user activity (event count) and value mass, per type.
- ``simple_linear_regression`` (#211): CH ``simpleLinearRegression``
  — value-on-hour-of-day OLS (slope, intercept, r²) per event type.
- ``roc_auc_doc_length`` (#212): CH ``arrayAUC`` — how well doc
  length separates each language from the rest (ROC AUC via the
  rank/U-statistic identity, the standard corpus-signal sanity check).
- ``interval_length_sum`` (#213): CH ``intervalLengthSum`` — per-day
  union length of overlapping per-event activity intervals.
- ``skew_kurtosis_by_type`` (#230): CH ``skewPop``/``kurtPop`` —
  third/fourth-moment shape drift per type from exact integer power
  sums (values quantized to dollars so x⁴ stays in BIGINT).

Reference parity: the reference (a chain indexer, Node.js→ClickHouse)
exposes these through ClickHouse's aggregate function surface; none
has a JS twin. Exactness discipline (file rule, same as
ch_aggregates.py): every statistic is computed from EXACT integer
rank/count/sum primitives; any final irrational step (sqrt, division
to ppm) is ONE shared formula string executed by both engines over
identical integers, so even floor-quantized outputs hash-match.

Rank-statistic exactness: tied ranks are handled with DOUBLED average
ranks — a tie group occupying positions [a, a+c-1] has average rank
(2a+c-1)/2, so its doubled rank 2a+c-1 is an exact BIGINT, and every
rank-sum stays integer until the final normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

# DuckDB CTE producing the per-(type-pair, distinct-cent) count frame
# both rank tests run on: one combinable (type, cent) aggregate over
# the event stream, then a tiny type-pair fan-out.
_PAIR_VALUE_SQL = """
    g AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    tp AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM g) a
      JOIN (SELECT DISTINCT event_type FROM g) b
        ON a.event_type < b.event_type
    ),
    pv AS (
      SELECT tp.type_a, tp.type_b, g.c,
             SUM(CASE WHEN g.event_type = tp.type_a THEN g.cnt
                      ELSE 0 END) AS c_a,
             SUM(CASE WHEN g.event_type = tp.type_b THEN g.cnt
                      ELSE 0 END) AS c_b
      FROM g JOIN tp
        ON g.event_type = tp.type_a OR g.event_type = tp.type_b
      GROUP BY 1, 2, 3
    )
"""


def _pair_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(type_a, type_b, c, c_a, c_b): for every event-type pair, the
    pooled distinct value-cents frame with per-side multiplicities.

    Scale shape: duplicates collapse FIRST — one map-side-combinable
    (event_type, cent) aggregate is the only pass over the event
    stream (the quantile_exact_weighted idiom); the pair fan-out
    (≤ |types|−1 per row, via a broadcast inequality join on the
    |types|-row frame) and everything downstream run on the distinct
    -value frame, which is bounded by value cardinality, not rows."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    g = e.groupBy("event_type", "c").agg(F.count("*").alias("cnt"))
    types = g.select("event_type").distinct()
    tp = types.select(F.col("event_type").alias("type_a")).join(
        F.broadcast(types.select(F.col("event_type").alias("type_b"))),
        F.col("type_a") < F.col("type_b"),
    )
    fan = g.join(
        F.broadcast(tp),
        (F.col("event_type") == F.col("type_a"))
        | (F.col("event_type") == F.col("type_b")),
    )
    return fan.groupBy("type_a", "type_b", "c").agg(
        F.sum(
            F.when(F.col("event_type") == F.col("type_a"), F.col("cnt"))
            .otherwise(F.lit(0))
        ).alias("c_a"),
        F.sum(
            F.when(F.col("event_type") == F.col("type_b"), F.col("cnt"))
            .otherwise(F.lit(0))
        ).alias("c_b"),
    )


# ---------------------------------------------------------------------------
# 208. mann_whitney_u_pairs — ClickHouse mannWhitneyUTest() analog
# ---------------------------------------------------------------------------
@register(
    "mann_whitney_u_pairs",
    oracle=f"""
    WITH {_PAIR_VALUE_SQL},
    r AS (
      SELECT type_a, type_b, c_a, c_b,
             COALESCE(SUM(c_a + c_b) OVER (
               PARTITION BY type_a, type_b ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS below
      FROM pv
    )
    SELECT type_a, type_b,
           CAST(SUM(c_a) AS BIGINT) AS n_a,
           CAST(SUM(c_b) AS BIGINT) AS n_b,
           CAST(SUM(c_a * (2 * below + c_a + c_b + 1))
                - SUM(c_a) * (SUM(c_a) + 1) AS BIGINT) AS u2_a,
           CAST((SUM(c_a * (2 * below + c_a + c_b + 1))
                 - SUM(c_a) * (SUM(c_a) + 1)) * 1000000
                // (2 * SUM(c_a) * SUM(c_b)) AS BIGINT) AS cles_ppm
    FROM r GROUP BY type_a, type_b
    """,
)
def mann_whitney_u_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``mannWhitneyUTest``: the rank-sum U statistic of
    event value between every pair of event types — the
    distribution-free A/B readout (CH pairs it with welchTTest; so do
    we, #190). ``u2_a`` is 2·U of the lexicographically smaller type
    (doubled to stay integer under tie-averaged ranks), ``cles_ppm``
    the common-language effect size U/(n_a·n_b) in ppm — exact
    integer floor-division, no floats anywhere.

    Rank exactness: with duplicates collapsed to (value, c_a, c_b)
    rows, a tie group starting above ``below`` pooled observations
    occupies positions [below+1, below+c_a+c_b], so its doubled
    average rank is 2·below + c_a + c_b + 1 and the doubled rank sum
    of side A is c_a·that — all BIGINT (bounded by 2n² ≈ 2·10¹⁸ at
    10⁹ rows/pair; beyond that the cents would quantize coarser).

    Scale shape: one combinable (type, cent) agg over the stream; the
    cumulative window runs per type-pair over DISTINCT cents (value
    cardinality, not row count — the quantile_exact_weighted
    precedent), and the final agg reuses the same partitioning."""
    pv = _pair_value_counts(spark, sf_dir)
    w = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = pv.withColumn(
        "below", F.coalesce(F.sum(F.col("c_a") + F.col("c_b")).over(w), F.lit(0))
    )
    agg = r.groupBy("type_a", "type_b").agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
        F.sum(
            F.col("c_a") * (2 * F.col("below") + F.col("c_a") + F.col("c_b") + 1)
        ).alias("r2_a"),
    )
    return agg.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long")
        .alias("u2_a"),
        F.expr(
            "CAST((r2_a - n_a * (n_a + 1)) * 1000000"
            " DIV (2 * n_a * n_b) AS BIGINT)"
        ).alias("cles_ppm"),
    )


# ---------------------------------------------------------------------------
# 209. ks_test_pairs — ClickHouse kolmogorovSmirnovTest() analog
# ---------------------------------------------------------------------------
@register(
    "ks_test_pairs",
    oracle=f"""
    WITH {_PAIR_VALUE_SQL},
    r AS (
      SELECT type_a, type_b,
             SUM(c_a) OVER (PARTITION BY type_a, type_b ORDER BY c
               ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(c_b) OVER (PARTITION BY type_a, type_b ORDER BY c
               ROWS UNBOUNDED PRECEDING) AS cum_b,
             SUM(c_a) OVER (PARTITION BY type_a, type_b) AS n_a,
             SUM(c_b) OVER (PARTITION BY type_a, type_b) AS n_b
      FROM pv
    )
    SELECT type_a, type_b,
           CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num,
           CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) * 1000
                // (MAX(n_a) * MAX(n_b)) AS BIGINT) AS d_milli
    FROM r GROUP BY type_a, type_b
    """,
)
def ks_test_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``kolmogorovSmirnovTest``: the two-sample KS
    distance D = max |F_a − F_b| between every event-type pair's
    value distribution — the "did the distribution shift" monitor.

    Exactness: D's numerator is held as the EXACT integer
    max |cum_a·n_b − cum_b·n_a| (common denominator n_a·n_b), so the
    comparison inside the max is integer; ``d_milli`` quantizes by
    integer floor-division (milli not ppm: d_num·10⁶ could overflow
    BIGINT at 10⁹-row pairs, d_num·10³ cannot until ~10¹⁵ n_a·n_b).

    Scale shape: identical to #208 — the only full-stream pass is the
    combinable (type, cent) agg; the cumulative-CDF windows and the
    per-pair totals share ONE (type_a, type_b) partitioning over the
    distinct-cents frame."""
    pv = _pair_value_counts(spark, sf_dir)
    wc = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("type_a", "type_b")
    r = pv.select(
        "type_a",
        "type_b",
        F.sum("c_a").over(wc).alias("cum_a"),
        F.sum("c_b").over(wc).alias("cum_b"),
        F.sum("c_a").over(wt).alias("n_a"),
        F.sum("c_b").over(wt).alias("n_b"),
    )
    return (
        r.groupBy("type_a", "type_b")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.max(
                F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
            )
            .cast("long")
            .alias("d_num"),
        )
        .withColumn(
            "d_milli",
            F.expr("CAST(d_num * 1000 DIV (n_a * n_b) AS BIGINT)"),
        )
    )


# ---------------------------------------------------------------------------
# 210. spearman_rank_corr — ClickHouse rankCorr() analog
# ---------------------------------------------------------------------------
# final normalization: ONE shared formula string over exact integer
# doubled-rank sums (cast to double before the cubic-scale products,
# which would overflow BIGINT past ~10⁶ users/type)
_SPEARMAN_RHO = """
    (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
       * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
"""


@register(
    "spearman_rank_corr",
    oracle=f"""
    WITH u AS (
      SELECT event_type, user_id,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT event_type,
             2 * RANK() OVER (PARTITION BY event_type ORDER BY x)
               + COUNT(*) OVER (PARTITION BY event_type ORDER BY x
                   RANGE BETWEEN CURRENT ROW AND CURRENT ROW) - 1 AS rx,
             2 * RANK() OVER (PARTITION BY event_type ORDER BY y)
               + COUNT(*) OVER (PARTITION BY event_type ORDER BY y
                   RANGE BETWEEN CURRENT ROW AND CURRENT ROW) - 1 AS ry
      FROM u
    ),
    s AS (
      SELECT event_type, COUNT(*) AS m,
             SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
             SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
      FROM rk GROUP BY event_type
    )
    SELECT event_type, CAST(m AS BIGINT) AS n_users,
           CAST(floor(({_SPEARMAN_RHO}) * 1000000) AS BIGINT) AS rho_ppm
    FROM s
    """,
)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``rankCorr``: Spearman rank correlation, per event
    type, between each user's activity (event count) and value mass —
    "do heavy users move more value" without assuming linearity.

    Exactness: tie-averaged ranks are DOUBLED (header rule) so every
    rank and rank-product sum is an exact BIGINT (rx·ry ≤ 4m², sums
    ≤ 4m³ — exact to ~10⁶ users/type, then doubles take over inside
    the shared formula); rho is Pearson over those integer sums via
    ONE shared formula string (the doubling cancels), so both engines
    run identical IEEE ops and the ppm floor matches bit-for-bit.

    Scale shape: the event stream collapses to the user grain with
    one combinable agg; both rank windows (rank() for the tie-group
    start, a RANGE CURRENT ROW peer count for its size — peers share
    the sort, so ONE partitioning and two sorts per variable, never a
    second exchange) run on the user-grain frame, and the final agg
    is per-type trivia."""
    u = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("x"), F.sum("cents").alias("y"))
    )
    wx = Window.partitionBy("event_type").orderBy("x")
    wy = Window.partitionBy("event_type").orderBy("y")
    rk = u.select(
        "event_type",
        (
            2 * F.rank().over(wx)
            + F.count("*").over(wx.rangeBetween(0, 0))
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(wy)
            + F.count("*").over(wy.rangeBetween(0, 0))
            - 1
        ).alias("ry"),
    )
    s = rk.groupBy("event_type").agg(
        F.count("*").alias("m"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    return s.select(
        "event_type",
        F.col("m").cast("long").alias("n_users"),
        F.expr(
            f"CAST(floor(({_SPEARMAN_RHO}) * 1000000) AS BIGINT)"
        ).alias("rho_ppm"),
    )


# ---------------------------------------------------------------------------
# 211. simple_linear_regression — ClickHouse simpleLinearRegression() analog
# ---------------------------------------------------------------------------
_SLR_SLOPE = """
    (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
"""
_SLR_INTERCEPT = f"""
    (CAST(sy AS DOUBLE) - ({_SLR_SLOPE}) * sx) / m
"""
_SLR_R2 = f"""
    (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    * (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / ((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
       * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
"""


@register(
    "simple_linear_regression",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM b GROUP BY event_type
    )
    SELECT event_type, m AS n_events,
           CAST(floor(({_SLR_SLOPE}) * 1000000) AS BIGINT) AS slope_micro,
           CAST(floor(({_SLR_INTERCEPT}) * 1000) AS BIGINT)
             AS intercept_milli,
           CAST(floor(({_SLR_R2}) * 1000000) AS BIGINT) AS r2_ppm
    FROM s
    """,
)
def simple_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``simpleLinearRegression``: OLS of event value
    (cents) on hour-of-day, per event type — the "does value drift
    across the day" one-aggregate regression CH serves (plus r², the
    ``corr``² CH exposes separately; same sums, free here).

    Exactness: (m, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs (x ≤ 23,
    y in cents — products are safe to ~10¹⁴ rows/type); slope,
    intercept, and r² are shared formula strings over those integers,
    so both engines execute identical IEEE sequences.

    Scale shape: ONE map-side-combinable groupBy over the event
    stream → |types| rows; no windows, no joins — the cheapest op in
    the statistics family and the template for any moment-based fit."""
    b = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    s = b.groupBy("event_type").agg(
        F.count("*").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return s.select(
        "event_type",
        F.col("m").cast("long").alias("n_events"),
        F.expr(
            f"CAST(floor(({_SLR_SLOPE}) * 1000000) AS BIGINT)"
        ).alias("slope_micro"),
        F.expr(
            f"CAST(floor(({_SLR_INTERCEPT}) * 1000) AS BIGINT)"
        ).alias("intercept_milli"),
        F.expr(f"CAST(floor(({_SLR_R2}) * 1000000) AS BIGINT)").alias(
            "r2_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# 212. roc_auc_doc_length — ClickHouse arrayAUC() analog
# ---------------------------------------------------------------------------
@register(
    "roc_auc_doc_length",
    oracle="""
    WITH s AS (
      SELECT CAST(n_chars AS BIGINT) AS sc, lang,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1, 2
    ),
    v AS (SELECT sc, SUM(cnt) AS c FROM s GROUP BY sc),
    r AS (
      SELECT sc,
             COALESCE(SUM(c) OVER (ORDER BY sc
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below,
             c
      FROM v
    ),
    j AS (
      SELECT s.lang, s.cnt, 2 * r.below + r.c + 1 AS rank2
      FROM s JOIN r USING (sc)
    ),
    tot AS (SELECT SUM(cnt) AS n FROM s),
    a AS (
      SELECT lang, SUM(cnt) AS n_pos, SUM(cnt * rank2) AS r2_pos
      FROM j GROUP BY lang
    )
    SELECT lang, CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n - n_pos AS BIGINT) AS n_neg,
           CAST((r2_pos - n_pos * (n_pos + 1)) * 1000000
                // (2 * n_pos * (n - n_pos)) AS BIGINT) AS auc_ppm
    FROM a CROSS JOIN tot
    """,
)
def roc_auc_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayAUC``: ROC AUC of document length as a
    one-vs-rest classifier for each language — the standard "is this
    signal informative" sanity check a corpus owner runs before using
    a score in a keep-rule (AUC≈0.5 ⇒ length carries no language
    signal).

    Exactness via the AUC = U/(n⁺·n⁻) rank identity: ONE global
    doubled-rank frame over DISTINCT length values serves every
    language (ranks don't depend on the label), each per-language
    rank sum is an exact BIGINT, and the ppm is integer floor
    division — no floats anywhere.

    Scale shape: the corpus collapses to a (length, lang) count frame
    with one combinable agg; the single cumulative window runs over
    DISTINCT lengths (bounded by the length domain, not corpus size);
    the label join is distinct-value-frame-sized; the 1-row total
    broadcasts."""
    s = (
        load(spark, sf_dir, "documents")
        .groupBy(F.col("n_chars").cast("long").alias("sc"), "lang")
        .agg(F.count("*").alias("cnt"))
    )
    v = s.groupBy("sc").agg(F.sum("cnt").alias("c"))
    w = Window.orderBy("sc").rowsBetween(Window.unboundedPreceding, -1)
    r = v.select(
        "sc",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("below"),
        "c",
    )
    j = s.join(r, "sc").select(
        "lang", "cnt", (2 * F.col("below") + F.col("c") + 1).alias("rank2")
    )
    tot = s.agg(F.sum("cnt").alias("n"))
    a = j.groupBy("lang").agg(
        F.sum("cnt").alias("n_pos"),
        F.sum(F.col("cnt") * F.col("rank2")).alias("r2_pos"),
    )
    return a.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n_pos").cast("long").alias("n_pos"),
        (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        F.expr(
            "CAST((r2_pos - n_pos * (n_pos + 1)) * 1000000"
            " DIV (2 * n_pos * (n - n_pos)) AS BIGINT)"
        ).alias("auc_ppm"),
    )


# ---------------------------------------------------------------------------
# 213. interval_length_sum — ClickHouse intervalLengthSum() analog
# ---------------------------------------------------------------------------
@register(
    "interval_length_sum",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             epoch_us(ts) AS s,
             epoch_us(ts)
               + (CAST(round(value * 100) AS BIGINT) % 300 + 1) * 1000000
               AS e
      FROM events
    ),
    sw AS (
      SELECT user_id, day, s, e,
             MAX(e) OVER (PARTITION BY user_id, day ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM iv
    ),
    cov AS (
      SELECT user_id, day,
             SUM(GREATEST(e - GREATEST(s, COALESCE(pm, s)),
                          CAST(0 AS BIGINT))) AS covered_us,
             COUNT(*) AS n_iv
      FROM sw GROUP BY user_id, day
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
           CAST(SUM(covered_us) AS BIGINT) AS covered_us,
           CAST(MAX(covered_us) AS BIGINT) AS max_user_covered_us
    FROM cov GROUP BY day
    """,
)
def interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum``: total UNION length of
    overlapping activity intervals — per day, how much wall-clock was
    covered by at least one interval of each user (double-counting
    overlaps is the classic utilization-metric bug this aggregate
    exists to avoid). Intervals are synthesized deterministically from
    the event data: [ts, ts + (cents mod 300 + 1) s).

    Exactness: all geometry in integer epoch-MICROSECONDS; the union
    length per key is the gaps-and-islands identity
    Σ max(0, e − max(s, running-max-of-prior-e)) — integer min/max
    only. The (s, e) tie ordering is total, so both engines walk one
    permutation.

    Scale shape: the sweep partitions by (user, day) — bounded
    windows (one user-day of events), the same stripe trick as
    maxIntersections (#197); the roll-up to day grain is a combinable
    agg. Companion to #197: that one reports PEAK concurrency, this
    one reports covered TIME."""
    iv = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + (
                F.pmod(F.round(F.col("value") * 100).cast("long"), F.lit(300))
                + 1
            )
            * 1_000_000
        ).alias("e"),
    )
    w = (
        Window.partitionBy("user_id", "day")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sw = iv.withColumn("pm", F.max("e").over(w))
    cov = sw.groupBy("user_id", "day").agg(
        F.sum(
            F.greatest(
                F.col("e")
                - F.greatest(F.col("s"), F.coalesce(F.col("pm"), F.col("s"))),
                F.lit(0).cast("long"),
            )
        ).alias("covered_us"),
        F.count("*").alias("n_iv"),
    )
    return cov.groupBy("day").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.sum("covered_us").cast("long").alias("covered_us"),
        F.max("covered_us").cast("long").alias("max_user_covered_us"),
    )


# ---------------------------------------------------------------------------
# 230. skew_kurtosis_by_type — ClickHouse skewPop()/kurtPop() analog
# ---------------------------------------------------------------------------
# central moments from exact raw integer power sums; ONE shared formula
# string so both engines run the identical IEEE sequence
_MOM_MEAN = "(CAST(s1 AS DOUBLE) / m)"
_MOM_M2 = f"(CAST(s2 AS DOUBLE) / m - {_MOM_MEAN} * {_MOM_MEAN})"
_MOM_M3 = (
    f"(CAST(s3 AS DOUBLE) / m - 3 * {_MOM_MEAN} * (CAST(s2 AS DOUBLE) / m)"
    f" + 2 * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN})"
)
_MOM_M4 = (
    f"(CAST(s4 AS DOUBLE) / m - 4 * {_MOM_MEAN} * (CAST(s3 AS DOUBLE) / m)"
    f" + 6 * {_MOM_MEAN} * {_MOM_MEAN} * (CAST(s2 AS DOUBLE) / m)"
    f" - 3 * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN})"
)
_SKEW = f"({_MOM_M3} / pow({_MOM_M2}, 1.5))"
_KURT = f"({_MOM_M4} / ({_MOM_M2} * {_MOM_M2}))"


@register(
    "skew_kurtosis_by_type",
    oracle=f"""
    WITH b AS (
      SELECT event_type, CAST(round(value) AS BIGINT) AS x FROM events
    ),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
             SUM(x) AS s1, SUM(x * x) AS s2,
             SUM(x * x * x) AS s3, SUM(x * x * x * x) AS s4
      FROM b GROUP BY event_type
    )
    SELECT event_type, m AS n_events,
           CAST(floor(({_SKEW}) * 1000000) AS BIGINT) AS skew_micro,
           CAST(floor(({_KURT}) * 1000000) AS BIGINT) AS kurt_micro
    FROM s
    """,
)
def skew_kurtosis_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewPop`` / ``kurtPop``: third- and fourth-moment
    shape statistics of event value per type — the "is this
    distribution still the one we tuned thresholds for" drift check
    that variance alone can't see.

    Exactness: values quantize to DOLLARS per row (not cents — x⁴
    must stay in BIGINT: |x|≤490 ⇒ x⁴≤5.8·10¹⁰, exact to ~10⁸
    rows/type; past that the op would quantize coarser, noted not
    needed here); the four raw power sums are exact BIGINTs and the
    central-moment/skew/kurtosis algebra is ONE shared formula string,
    so both engines run the identical IEEE sequence before the micro
    floor.

    Scale shape: one map-side-combinable groupBy over the stream →
    |types| rows; zero windows, zero joins — the #211 moment-agg
    template extended two powers."""
    b = load(spark, sf_dir, "events").select(
        "event_type", F.round("value").cast("long").alias("x")
    )
    s = b.groupBy("event_type").agg(
        F.count("*").alias("m"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias("s4"),
    )
    return s.select(
        "event_type",
        F.col("m").cast("long").alias("n_events"),
        F.expr(f"CAST(floor(({_SKEW}) * 1000000) AS BIGINT)").alias(
            "skew_micro"
        ),
        F.expr(f"CAST(floor(({_KURT}) * 1000000) AS BIGINT)").alias(
            "kurt_micro"
        ),
    )
