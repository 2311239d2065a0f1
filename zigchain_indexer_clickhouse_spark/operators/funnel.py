"""Behavioral-analytics operators (#81-83 windowFunnel / retention /
sequenceMatch, plus the round-5/6 growth: strict-order mode #177,
sequenceCount #180, sequenceNextNode #207, path mining #223, streak
histogram #224, cohort transitions #225, funnel latency #226):
ClickHouse's event-sequence aggregate-function family, re-expressed
Spark-first. The reference serves its analytics out of ClickHouse
(SURVEY §2.2), where these are the standard event-stream reporting
functions; an engine claiming the same serving surface needs them.

Design: all three are per-entity sequence computations. The scalable
shape is ONE shuffle on user_id into a per-user sorted event array,
then a pure expression-land fold (`F.aggregate` over the sorted array)
— no second shuffle, no Python, no self-joins. The DuckDB oracles use
an equivalent relational (join/EXISTS) formulation, so the fold's
semantics are cross-checked against an independent derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day funnel window in microseconds


# --------------------------------------------------------------------------
# 81. window_funnel — ClickHouse windowFunnel(signup → click → purchase)
# --------------------------------------------------------------------------
@register(
    "window_funnel",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click'
        AND e.ts > t1.ts1 AND e.ts <= t1.ts1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts3
      FROM events e
      JOIN t1 ON e.user_id = t1.user_id
      JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > t2.ts2 AND e.ts <= t1.ts1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    )
    SELECT t1.user_id, t1.ts1 AS funnel_start,
           CAST(CASE WHEN t3.ts3 IS NOT NULL THEN 3
                     WHEN t2.ts2 IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS level
    FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
            LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
)
def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel analog: deepest funnel level (signup → click →
    purchase) each user reaches within 7 days of their first signup,
    steps strictly ordered in time.

    One shuffle (groupBy user_id, collecting only funnel-relevant
    events), then the chain is computed by a fold over the time-sorted
    array with a (level, start, prev) accumulator — expression-land,
    codegen'd, zero extra passes. The oracle derives the same result
    relationally (3 chained min-aggregates), so the fold is verified
    against an independent formulation."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    per_user = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("us"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("t"),
                )
            )
        ).alias("seq")
    )
    init = F.named_struct(
        F.lit("lvl"), F.lit(0),
        F.lit("t1"), F.lit(0).cast("long"),
        F.lit("prev"), F.lit(0).cast("long"),
    )

    def step(acc, ev):
        adv1 = (acc["lvl"] == 0) & (ev["t"] == "signup")
        in_win = (ev["us"] > acc["prev"]) & (ev["us"] <= acc["t1"] + _WINDOW_US)
        adv2 = (acc["lvl"] == 1) & (ev["t"] == "click") & in_win
        adv3 = (acc["lvl"] == 2) & (ev["t"] == "purchase") & in_win
        return F.named_struct(
            F.lit("lvl"),
            F.when(adv1, 1).when(adv2, 2).when(adv3, 3).otherwise(acc["lvl"]),
            F.lit("t1"),
            F.when(adv1, ev["us"]).otherwise(acc["t1"]),
            F.lit("prev"),
            F.when(adv1 | adv2 | adv3, ev["us"]).otherwise(acc["prev"]),
        )

    folded = per_user.select(
        "user_id", F.aggregate("seq", init, step).alias("f")
    ).filter(F.col("f.lvl") >= 1)
    return folded.select(
        "user_id",
        F.timestamp_micros(F.col("f.t1")).alias("funnel_start"),
        F.col("f.lvl").cast("int").alias("level"),
    )


# --------------------------------------------------------------------------
# 82. retention_cohorts — ClickHouse retention() cohort analysis
# --------------------------------------------------------------------------
@register(
    "retention_cohorts",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    cohort AS (SELECT user_id, MIN(d) AS c FROM days GROUP BY user_id)
    SELECT c.c AS cohort_day,
           COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM days d
                          WHERE d.user_id = c.user_id AND d.d = c.c + 1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS retained_d1,
           CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM days d
                          WHERE d.user_id = c.user_id AND d.d = c.c + 7)
                    THEN 1 ELSE 0 END) AS BIGINT) AS retained_d7
    FROM cohort c GROUP BY c.c
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention() analog: users bucketed by first-activity day, with
    day-1 and day-7 return counts — the standard cohort table.

    Shape: dedupe to (user, day) — the wide-key shuffle that partial
    aggregation collapses map-side — then ONE groupBy(user) builds the
    per-user day set (≤ active-day count, tiny) and computes cohort +
    return flags with array_contains; the final cohort rollup is a
    ~one-row-per-day aggregate. No EXISTS self-joins at any scale."""
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    per_user = days.groupBy("user_id").agg(
        F.min("d").alias("c"), F.collect_set("d").alias("ds")
    )
    flags = per_user.select(
        F.col("c").alias("cohort_day"),
        F.array_contains("ds", F.date_add(F.col("c"), 1)).cast("int").alias("r1"),
        F.array_contains("ds", F.date_add(F.col("c"), 7)).cast("int").alias("r7"),
    )
    return flags.groupBy("cohort_day").agg(
        F.count("*").alias("n_users"),
        F.sum("r1").cast("long").alias("retained_d1"),
        F.sum("r7").cast("long").alias("retained_d7"),
    )


# --------------------------------------------------------------------------
# 83. sequence_match — ClickHouse sequenceMatch pattern detection
# --------------------------------------------------------------------------
@register(
    "sequence_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'signup' THEN 's'
                                        WHEN 'click' THEN 'c'
                                        WHEN 'purchase' THEN 'p'
                                        WHEN 'view' THEN 'v'
                                        ELSE 'e' END, ''
                        ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(strlen(seq) AS INT) AS seq_len,
           CAST(CASE WHEN regexp_matches(seq, 's.*c.*p') THEN 1 ELSE 0 END
                AS INT) AS match_signup_click_purchase,
           CAST(CASE WHEN regexp_matches(seq, 'ee') THEN 1 ELSE 0 END
                AS INT) AS match_double_error
    FROM seqs
    """,
)
def sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch analog: encode each user's time-ordered event
    stream as a character string (one char per event type) and test
    ordered patterns with a regex — `(?1).*(?2).*(?3)` becomes
    `s.*c.*p`. One shuffle to the per-user sorted encoding; the match
    itself is a codegen'd regexp over a short string. Ties broken by
    event_id on both engines so the encoding is deterministic."""
    e = load(spark, sf_dir, "events")
    chr_col = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "view", "v")
        .otherwise("e")
    )
    seqs = (
        e.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").alias("eid"),
                chr_col.alias("ch"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("ev")), lambda s: s["ch"]
                ),
                "",
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("int").alias("seq_len"),
        F.col("seq").rlike("s.*c.*p").cast("int")
        .alias("match_signup_click_purchase"),
        F.col("seq").rlike("ee").cast("int").alias("match_double_error"),
    )


# --------------------------------------------------------------------------
# 177. window_funnel_strict — windowFunnel('strict_order') mode
# --------------------------------------------------------------------------
@register(
    "window_funnel_strict",
    oracle="""
    WITH f AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
      WHERE event_type IN ('signup', 'click', 'purchase')
    ),
    a AS (
      SELECT user_id, MIN(rn) AS rn1 FROM f
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    j AS (
      SELECT a.user_id, f1.ts AS ts1,
             f2.event_type AS t2, f2.ts AS ts2,
             f3.event_type AS t3, f3.ts AS ts3
      FROM a
      JOIN f f1 ON f1.user_id = a.user_id AND f1.rn = a.rn1
      LEFT JOIN f f2 ON f2.user_id = a.user_id AND f2.rn = a.rn1 + 1
      LEFT JOIN f f3 ON f3.user_id = a.user_id AND f3.rn = a.rn1 + 2
    )
    SELECT user_id, ts1 AS funnel_start,
           CAST(CASE WHEN t2 = 'click' AND ts2 <= ts1 + INTERVAL 7 DAY
                      AND t3 = 'purchase' AND ts3 <= ts1 + INTERVAL 7 DAY
                     THEN 3
                     WHEN t2 = 'click' AND ts2 <= ts1 + INTERVAL 7 DAY
                     THEN 2
                     ELSE 1 END AS INT) AS level
    FROM j
    """,
)
def window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(7d)('strict_order')``: the funnel only
    advances while the funnel-relevant event stream is EXACTLY the
    expected sequence — any interleaved funnel event of the wrong type
    terminates the chain at its current level (the base #81 mode skips
    past interleaving; strict_order is how you measure a flow users
    must not wander out of). Anchored at the user's first signup like
    #81, so the two modes are directly comparable.

    Plan shape: ONE window over the funnel-filtered stream assigns
    per-user sequence numbers and leads; the anchor row then reads the
    next two funnel events from its own lead columns — no fold needed,
    because strict order means the chain IS positions rn1, rn1+1,
    rn1+2. A single user_id shuffle; the funnel filter prunes the scan
    to the three event types before the exchange."""
    f = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase")
    ).select("user_id", "ts", "event_id", "event_type")
    from pyspark.sql import Window as W

    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    led = f.select(
        "user_id",
        "ts",
        "event_type",
        F.row_number().over(wo).alias("rn"),
        F.lead("event_type", 1).over(wo).alias("t2"),
        F.lead("ts", 1).over(wo).alias("ts2"),
        F.lead("event_type", 2).over(wo).alias("t3"),
        F.lead("ts", 2).over(wo).alias("ts3"),
    )
    # anchor = the user's FIRST signup row
    wa = W.partitionBy("user_id").orderBy(
        (F.col("event_type") != "signup").cast("int"), "rn"
    )
    anchor = (
        led.withColumn("arn", F.row_number().over(wa))
        .filter((F.col("arn") == 1) & (F.col("event_type") == "signup"))
    )
    win_end = F.col("ts") + F.expr("INTERVAL 7 DAY")
    lvl2 = (F.col("t2") == "click") & (F.col("ts2") <= win_end)
    lvl3 = lvl2 & (F.col("t3") == "purchase") & (F.col("ts3") <= win_end)
    return anchor.select(
        "user_id",
        F.col("ts").alias("funnel_start"),
        F.when(lvl3, 3).when(lvl2, 2).otherwise(1).cast("int").alias("level"),
    )


# --------------------------------------------------------------------------
# 180. sequence_count — ClickHouse sequenceCount('(?1)(?2)') analog
# --------------------------------------------------------------------------
@register(
    "sequence_count",
    oracle="""
    WITH f AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('signup', 'click')
    ),
    c AS (
      SELECT user_id, a, b,
             SUM(b) OVER w - SUM(a) OVER w AS excess
      FROM f
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id,
           CAST(SUM(a) AS BIGINT) AS n_signups,
           CAST(SUM(b) AS BIGINT) AS n_clicks,
           CAST(SUM(b) - GREATEST(MAX(excess), 0) AS BIGINT) AS n_matches
    FROM c GROUP BY user_id
    """,
)
def sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1)(?2)')(ts, signup, click)``:
    how many NON-OVERLAPPING signup→click chains each user completes
    (greedy left-to-right matching — each click consumes the earliest
    unconsumed signup before it).

    The fold the greedy matcher suggests is unnecessary: pairing
    signups (+1, open) with clicks (close if any open) is bracket
    matching, and bracket matching has a closed form —
    ``matches = total_clicks − max(0, max_prefix(cum_clicks −
    cum_signups))`` (the max prefix excess counts exactly the clicks
    that arrive with nothing open). That turns an inherently
    sequential-looking operator into ONE per-user running-sum window
    plus an aggregate on the same key — a single shuffle, no
    higher-order fold, and an oracle that replays the same arithmetic.
    The funnel filter prunes the scan to two event types before the
    exchange."""
    f = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "click")
    ).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "signup").cast("int").alias("a"),
        (F.col("event_type") == "click").cast("int").alias("b"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = f.withColumn(
        "excess", F.sum("b").over(w) - F.sum("a").over(w)
    )
    return c.groupBy("user_id").agg(
        F.sum("a").cast("long").alias("n_signups"),
        F.sum("b").cast("long").alias("n_clicks"),
        (F.sum("b") - F.greatest(F.max("excess"), F.lit(0)))
        .cast("long")
        .alias("n_matches"),
    )


# --------------------------------------------------------------------------
# 193. conversion_attribution — first-touch / last-touch click attribution
# --------------------------------------------------------------------------
ATTR_LOOKBACK_DAYS = 7


@register(
    "conversion_attribution",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    fc AS (
      SELECT p.event_id, MIN(e.ts) AS fts
      FROM p JOIN events e ON e.user_id = p.user_id
       AND e.event_type = 'click' AND e.ts < p.ts
      GROUP BY p.event_id
    ),
    lc AS (
      SELECT p.event_id, MAX(e.ts) AS lts
      FROM p JOIN events e ON e.user_id = p.user_id
       AND e.event_type = 'click' AND e.ts < p.ts
       AND e.ts >= p.ts - INTERVAL {ATTR_LOOKBACK_DAYS} DAY
      GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           fc.fts AS first_touch_ts,
           lc.lts AS last_touch_ts,
           CAST(CASE WHEN lc.lts IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS attributed
    FROM p
    LEFT JOIN fc ON fc.event_id = p.event_id
    LEFT JOIN lc ON lc.event_id = p.event_id
    """,
)
def conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution per conversion: for every purchase, the
    user's FIRST click ever before it (first-touch: which acquisition
    channel gets origin credit) and the LAST click within a
    {ATTR_LOOKBACK_DAYS}-day lookback (last-touch: which interaction
    closed). The standard two-model readout CH users build from one
    sequenced scan.

    Plan: ONE shuffle on user_id, then both touches come from a single
    sorted window pass — ``first``/``last(ignorenulls)`` over preceding
    rows — never a per-purchase self-join (the oracle's relational
    join formulation is the independent cross-check). Strictly-before
    semantics under timestamp ties is an ORDERING decision: purchases
    sort BEFORE same-timestamp clicks ((ts, kind, event_id) key), so a
    click at exactly the purchase instant is excluded on both engines.
    The lookback filter is applied to the window result value, which
    is only correct because the window maximizes ts and the filter is
    a suffix condition on ts — the masked case (a same-ts click hiding
    an earlier qualifying one) is prevented by the tie ordering."""
    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    kind = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", kind, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    touched = e.select(
        "event_id", "user_id", "ts", "event_type",
        F.first(click_ts, ignorenulls=True).over(w).alias("fts"),
        F.last(click_ts, ignorenulls=True).over(w).alias("lts_raw"),
    )
    return touched.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("fts").alias("first_touch_ts"),
        F.when(
            F.col("lts_raw")
            >= F.col("ts") - F.expr(f"INTERVAL {ATTR_LOOKBACK_DAYS} DAYS"),
            F.col("lts_raw"),
        ).alias("last_touch_ts"),
        F.when(
            F.col("lts_raw")
            >= F.col("ts") - F.expr(f"INTERVAL {ATTR_LOOKBACK_DAYS} DAYS"),
            1,
        ).otherwise(0).cast("int").alias("attributed"),
    )


# --------------------------------------------------------------------------
# 207. sequence_next_node — ClickHouse sequenceNextNode(): what comes next
# --------------------------------------------------------------------------
@register(
    "sequence_next_node",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER w AS nxt,
             SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS k
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    f AS (
      SELECT COALESCE(nxt, '(end)') AS next_node
      FROM o WHERE event_type = 'signup' AND k = 1
    ),
    t AS (SELECT COUNT(*) AS tot FROM f)
    SELECT next_node,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) * 1000000 // tot AS BIGINT) AS share_ppm
    FROM f, t GROUP BY next_node, tot
    """,
)
def sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward', 'first_match')``: for
    every user, find the FIRST 'signup' in the time-ordered stream and
    report which event type comes immediately after it — the
    "where do users go right after signing up" product dashboard.
    Users whose first signup is their last event land in the '(end)'
    bucket, so the share column sums to 1,000,000 ppm.

    Plan: ONE window pass per user — the lead() and the running
    signup-occurrence counter (``k``, which marks the first match
    without a second filtered window) share the same (user_id) hash
    partitioning and (ts, event_id) sort, so Spark computes both in a
    single Window node after a single exchange; the aggregation over
    matched rows is a tiny keyed agg (≤ #event_types + 1 groups) with
    the 1-row total broadcast back. Ties are impossible (event_id is
    unique) and the tie-break is pinned anyway — both engines walk one
    permutation."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    o = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("k"),
    )
    f = o.filter((F.col("event_type") == "signup") & (F.col("k") == 1)).select(
        F.coalesce("nxt", F.lit("(end)")).alias("next_node")
    )
    t = f.agg(F.count("*").alias("tot"))
    return (
        f.groupBy("next_node")
        .agg(F.count("*").alias("n_users"))
        .crossJoin(F.broadcast(t))
        .select(
            "next_node",
            "n_users",
            F.expr("n_users * 1000000 div tot").alias("share_ppm"),
        )
    )


# --------------------------------------------------------------------------
# 223. path_analysis — top 3-step behavioral paths
# --------------------------------------------------------------------------
@register(
    "path_analysis",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || t2 || '>' || t3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s WHERE t3 IS NOT NULL
    GROUP BY 1 ORDER BY n_occurrences DESC, path LIMIT 10
    """,
)
def path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the top-10 consecutive 3-step event
    sequences across all users — the "what do users actually do"
    query CH product-analytics deployments serve beside windowFunnel
    (#81 checks a HYPOTHESIZED order; this one discovers the orders
    that exist).

    Scale shape: ONE user_id exchange — both lead() offsets share a
    single (user_id, ts, event_id) sorted window pass; path strings
    are assembled post-window (≤ |types|³ distinct values, so the
    count agg collapses map-side); top-10 is TakeOrderedAndProject
    with a deterministic (count, path) tiebreak, no global sort.
    The (ts, event_id) ordering is total, so both engines walk one
    permutation under timestamp ties."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        s.groupBy(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(10)
    )


# --------------------------------------------------------------------------
# 224. active_streak_lengths — longest consecutive-day streak histogram
# --------------------------------------------------------------------------
@register(
    "active_streak_lengths",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    g AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS grp
      FROM d
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS len FROM g GROUP BY user_id, grp
    ),
    best AS (SELECT user_id, MAX(len) AS best FROM streaks GROUP BY user_id)
    SELECT CAST(best AS BIGINT) AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM best GROUP BY best
    """,
)
def active_streak_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, reported as a
    histogram (streak length → user count) — the engagement metric
    behind every "N-day streak" product surface, and a gaps-and-islands
    exercise CH serves with one window pass.

    The identity: on a user's DISTINCT sorted activity days,
    day − row_number() is constant exactly within a run of consecutive
    days — so streaks are one groupBy away, no self-joins.

    Scale shape: the (user, day) DISTINCT collapse is the only
    corpus-sized step (map-side combinable); the row_number window
    partitions per user over day-grain rows (≤ a few thousand rows per
    user even over a decade); streaks, best-per-user, and the final
    histogram are combinable aggs riding the same user partitioning."""
    d = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("grp"),
    )
    streaks = g.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    best = streaks.groupBy("user_id").agg(F.max("len").alias("best"))
    return best.groupBy(
        F.col("best").cast("long").alias("streak_days")
    ).agg(F.count("*").cast("long").alias("n_users"))


# --------------------------------------------------------------------------
# 225. cohort_transition_matrix — month-over-month engagement transitions
# --------------------------------------------------------------------------
@register(
    "cohort_transition_matrix",
    oracle="""
    WITH m AS (
      SELECT user_id, date_trunc('week', CAST(ts AS DATE)) AS week,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    seg AS (
      SELECT user_id, week,
             CASE WHEN n >= 20 THEN 'high'
                  WHEN n >= 10 THEN 'mid' ELSE 'low' END AS seg
      FROM m
    ),
    tr AS (
      SELECT user_id, week, seg,
             LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS pm,
             LAG(seg) OVER (PARTITION BY user_id ORDER BY week) AS ps
      FROM seg
    ),
    px AS (
      SELECT CASE WHEN pm IS NULL THEN '(new)'
                  WHEN pm + INTERVAL 7 DAY < week THEN '(gap)'
                  ELSE ps END AS from_seg,
             seg AS to_seg
      FROM tr
    ),
    tot AS (SELECT COUNT(*) AS t FROM px)
    SELECT from_seg, to_seg,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(COUNT(*) * 1000000 // MAX(tot.t) AS BIGINT) AS share_ppm
    FROM px CROSS JOIN tot GROUP BY from_seg, to_seg
    """,
)
def cohort_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week engagement transitions: each user's weekly
    activity is bucketed low/mid/high (fixed event-count thresholds),
    and the matrix counts (previous segment → current segment) moves —
    the churn/upgrade dashboard behind every retention review. A
    missing previous week is '(new)', a non-adjacent one '(gap)' (a
    lapsed user returning counts as re-acquisition, not a segment
    move — the classic transition-matrix bug made explicit).

    Scale shape: the event stream collapses to (user, week) with one
    combinable agg; the lag window rides user-grain weekly rows
    (≤ weeks-per-user); the matrix is ≤ (|segs|+2)² cells with a
    1-row total broadcast for the shares."""
    m = (
        load(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.date_trunc("week", F.col("ts").cast("date")).alias("week"),
        )
        .agg(F.count("*").alias("n"))
    )
    seg = m.select(
        "user_id",
        "week",
        F.when(F.col("n") >= 20, "high")
        .when(F.col("n") >= 10, "mid")
        .otherwise("low")
        .alias("seg"),
    )
    w = Window.partitionBy("user_id").orderBy("week")
    tr = seg.select(
        "seg",
        "week",
        F.lag("week").over(w).alias("pm"),
        F.lag("seg").over(w).alias("ps"),
    )
    px = tr.select(
        F.when(F.col("pm").isNull(), "(new)")
        .when(F.date_add(F.col("pm").cast("date"), 7) < F.col("week").cast("date"), "(gap)")
        .otherwise(F.col("ps"))
        .alias("from_seg"),
        F.col("seg").alias("to_seg"),
    )
    tot = px.agg(F.count("*").alias("t"))
    return (
        px.groupBy("from_seg", "to_seg")
        .agg(F.count("*").alias("n_transitions"))
        .crossJoin(F.broadcast(tot))
        .select(
            "from_seg",
            "to_seg",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            F.expr(
                "CAST(n_transitions * 1000000 DIV t AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


# --------------------------------------------------------------------------
# 226. funnel_time_to_convert — time-to-level distribution for the funnel
# --------------------------------------------------------------------------
@register(
    "funnel_time_to_convert",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click'
        AND e.ts > t1.ts1 AND e.ts <= t1.ts1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts3
      FROM events e
      JOIN t1 ON e.user_id = t1.user_id
      JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > t2.ts2 AND e.ts <= t1.ts1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    u AS (
      SELECT 2 AS level, epoch_us(t2.ts2) - epoch_us(t1.ts1) AS dur
      FROM t2 JOIN t1 USING (user_id)
      UNION ALL
      SELECT 3, epoch_us(t3.ts3) - epoch_us(t1.ts1)
      FROM t3 JOIN t1 USING (user_id)
    ),
    c AS (SELECT level, dur, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
    r AS (
      SELECT level, dur, cnt,
             SUM(cnt) OVER (PARTITION BY level ORDER BY dur
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY level) AS tot
      FROM c
    )
    SELECT CAST(level AS BIGINT) AS level,
           CAST(MAX(tot) AS BIGINT) AS n_users,
           CAST(MIN(dur) AS BIGINT) AS min_us,
           CAST(MAX(dur) AS BIGINT) AS max_us,
           CAST(MIN(CASE WHEN 2 * cum >= tot THEN dur END) AS BIGINT)
             AS median_us
    FROM r GROUP BY level
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for the #81 funnel: among users who reached
    level 2 (click) / level 3 (purchase), the min/median/max time from
    funnel start to reaching that level — the latency half of the
    funnel report (#81 reports depth; conversion REVIEWS need "how
    long did it take").

    The fold is #81's with the accumulator widened to keep each
    level's advance time (t2, t3), so durations come from the same
    single expression-land pass — no second scan, no joins. The
    median is EXACT lower-median via the established duplicates-
    collapse + cumulative-window idiom (2·cum ≥ tot on integer
    micros), partitioned by the 2-row level key. Oracle: the
    independent relational chain (#81's t1/t2/t3 CTEs) plus the same
    window formulation, so the fold's timing fields are verified
    against a formulation that never folds."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    per_user = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("us"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("t"),
                )
            )
        ).alias("seq")
    )
    z = F.lit(0).cast("long")
    init = F.named_struct(
        F.lit("lvl"), F.lit(0),
        F.lit("t1"), z, F.lit("t2"), z, F.lit("t3"), z,
        F.lit("prev"), z,
    )

    def step(acc, ev):
        adv1 = (acc["lvl"] == 0) & (ev["t"] == "signup")
        in_win = (ev["us"] > acc["prev"]) & (ev["us"] <= acc["t1"] + _WINDOW_US)
        adv2 = (acc["lvl"] == 1) & (ev["t"] == "click") & in_win
        adv3 = (acc["lvl"] == 2) & (ev["t"] == "purchase") & in_win
        return F.named_struct(
            F.lit("lvl"),
            F.when(adv1, 1).when(adv2, 2).when(adv3, 3).otherwise(acc["lvl"]),
            F.lit("t1"), F.when(adv1, ev["us"]).otherwise(acc["t1"]),
            F.lit("t2"), F.when(adv2, ev["us"]).otherwise(acc["t2"]),
            F.lit("t3"), F.when(adv3, ev["us"]).otherwise(acc["t3"]),
            F.lit("prev"),
            F.when(adv1 | adv2 | adv3, ev["us"]).otherwise(acc["prev"]),
        )

    folded = per_user.select(F.aggregate("seq", init, step).alias("f"))
    d2 = folded.filter(F.col("f.lvl") >= 2).select(
        F.lit(2).alias("level"), (F.col("f.t2") - F.col("f.t1")).alias("dur")
    )
    d3 = folded.filter(F.col("f.lvl") == 3).select(
        F.lit(3).alias("level"), (F.col("f.t3") - F.col("f.t1")).alias("dur")
    )
    c = d2.unionAll(d3).groupBy("level", "dur").agg(F.count("*").alias("cnt"))
    wc = (
        Window.partitionBy("level")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("level")
    r = c.select(
        "level", "dur", "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wt).alias("tot"),
    )
    return r.groupBy(F.col("level").cast("long").alias("level")).agg(
        F.max("tot").cast("long").alias("n_users"),
        F.min("dur").cast("long").alias("min_us"),
        F.max("dur").cast("long").alias("max_us"),
        F.min(
            F.when(2 * F.col("cum") >= F.col("tot"), F.col("dur"))
        ).cast("long").alias("median_us"),
    )
