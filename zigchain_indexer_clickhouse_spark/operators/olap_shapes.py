"""Remaining TPC-H plan shapes (SURVEY.md §2.2 #104-113): with these,
every one of the 22 TPC-H query patterns has a representative operator,
each reshaped onto the reduced test schema (no partsupp / shipmode /
commit-receipt dates — stand-ins noted per operator).

Why bother when the reference is an indexer? The ClickHouse tables it
writes are a reporting surface; these shapes are the canonical
reporting plans (correlated-min, distribution-of-counts, disjunctive
pushdown, global-scalar HAVING, double-correlated EXISTS) a user of
that surface runs — and each exercises a distinct Catalyst plan
property asserted in tests/test_plan_shapes.py.

Scale notes: dims broadcast; every correlated subquery is re-expressed
as aggregate-then-join (never a per-row subquery); global scalars ride
a single-row broadcast; fact-fact joins shuffle on the join key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register


# --------------------------------------------------------------------------
# 104. q2_min_cost_supplier — correlated-min supplier selection (Q2 shape)
# --------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH rs AS (
      SELECT s_suppkey, s_name, n_name FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA'
    ),
    fp AS (
      SELECT p_partkey FROM part
      WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
    ),
    cost AS (
      -- integer-scaled unit cost (floor of an identical IEEE product):
      -- ROUND(double, 4) half-way cases disagree between engines
      -- (BigDecimal HALF_UP vs libm), and the best-cost EQUALITY join
      -- amplifies a 1-ulp flip into a row diff — floor on the same
      -- double is bit-deterministic everywhere
      SELECT l_partkey, l_suppkey,
             CAST(MIN(floor(l_extendedprice / l_quantity * 10000))
                  AS BIGINT) AS unit_cost_x10k
      FROM lineitem
      JOIN fp ON p_partkey = l_partkey
      JOIN rs ON s_suppkey = l_suppkey
      GROUP BY 1, 2
    ),
    best AS (SELECT l_partkey, MIN(unit_cost_x10k) AS best_cost
             FROM cost GROUP BY 1)
    SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey,
           rs.s_name, rs.n_name, c.unit_cost_x10k
    FROM cost c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost_x10k = b.best_cost
    JOIN rs ON rs.s_suppkey = c.l_suppkey
    ORDER BY p_partkey, s_suppkey LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each part in a size/type slice, the minimum-cost
    supplier within one region (unit cost = extendedprice/quantity
    stands in for ps_supplycost). The correlated MIN subquery becomes
    aggregate-then-self-join: one (part, supp) agg, a per-part min over
    it, and an equi-join back — the per-part min table is one row per
    part (broadcastable at any realistic part count), and both dim
    filters are broadcast-semi-joined BELOW the big agg so only
    qualifying lineitems are ever aggregated."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load(spark, sf_dir, "supplier")
    rs = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    fp = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size").between(10, 20)) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    l = load(spark, sf_dir, "lineitem")
    cost = (
        l.join(F.broadcast(fp), l.l_partkey == fp.p_partkey)
        .join(F.broadcast(rs.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            # floor-scaled integer cost, not ROUND: half-way doubles
            # round differently across engines, and the best-cost
            # equality join turns that 1-ulp flip into a row diff
            F.min(
                F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 10000)
            )
            .cast("long")
            .alias("unit_cost_x10k")
        )
    )
    best = cost.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_cost_x10k").alias("best_cost")
    )
    return (
        cost.join(
            F.broadcast(best),
            (cost.l_partkey == best.bp) & (cost.unit_cost_x10k == best.best_cost),
        )
        .join(F.broadcast(rs), cost.l_suppkey == rs.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
            "unit_cost_x10k",
        )
        .orderBy("p_partkey", "s_suppkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# 105. q9_product_profit — multi-join profit by nation and year (Q9 shape)
# --------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
           ROUND(SUM(CAST(floor((l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity) * 10000)
                     AS BIGINT)) / 10000.0, 4) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%ring%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-line profit by supplier nation and order year.
    Supply cost stands in as 10% of p_retailprice (no partsupp table).
    part/supplier/nation broadcast into the lineitem scan (the p_name
    filter prunes part BEFORE the broadcast), orders is the one
    fact-fact shuffle join, then a single (nation, year) agg.

    The per-row profit is quantized to 1e-4 integers BEFORE summing
    (per-row doubles are bit-identical across engines; only summation
    ORDER differs — integer sums make order irrelevant), the same
    drift-proof pattern as embedding_centroids."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%ring%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.floor(profit * 10000).cast("long")) / 10000.0, 4
            ).alias("profit")
        )
    )


# --------------------------------------------------------------------------
# 106. q11_value_concentration — global-scalar HAVING (Q11 shape)
# --------------------------------------------------------------------------
@register(
    "q11_value_concentration",
    oracle="""
    WITH rs AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    val AS (
      -- per-row cents floor + integer SUM (order-independent; the
      -- threshold compare below can't flip on a summation-order ulp)
      SELECT l_suppkey,
             SUM(CAST(floor(l_extendedprice * l_quantity * 100)
                      AS BIGINT)) AS value_c
      FROM lineitem JOIN rs ON s_suppkey = l_suppkey
      GROUP BY 1
    )
    -- outer CAST on value_c: DuckDB SUM over BIGINT yields HUGEINT,
    -- whose driver-side hash differs from Spark's long (r4 fail class)
    SELECT l_suppkey AS s_suppkey, CAST(value_c AS BIGINT) AS value_c,
           CAST(value_c * 1000000 // total_c AS BIGINT) AS share_ppm
    FROM val, (SELECT SUM(value_c) AS total_c FROM val) t
    WHERE value_c * 1000 > total_c
    """,
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: suppliers holding an outsized share of total shipped
    value (value = extendedprice×quantity stands in for supplycost×
    availqty), scoped to one region. The HAVING-against-global-total
    runs as agg once → single-row broadcast of the total → filter; the
    per-supplier agg is computed exactly once and reused for both the
    numerator rows and the scalar."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = load(spark, sf_dir, "supplier")
    rs = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    l = load(spark, sf_dir, "lineitem")
    # per-row cents floor + integer SUM (see oracle note): the share
    # threshold is an exact integer compare at any scale
    val = (
        l.join(F.broadcast(rs), l.l_suppkey == rs.s_suppkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * F.col("l_quantity") * 100
                ).cast("long")
            ).alias("value_c")
        )
    )
    total = val.agg(F.sum("value_c").alias("total_c"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("total_c"))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "value_c",
            F.expr("CAST(value_c * 1000000 DIV total_c AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# 107. q12_priority_by_class — fact-fact join + conditional agg (Q12 shape)
# --------------------------------------------------------------------------
@register(
    "q12_priority_by_class",
    oracle="""
    SELECT l_linestatus,
           -- CAST: DuckDB integer SUM yields HUGEINT which hash-
           -- mismatches Spark's long at the driver (r4 fail class)
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12_priority_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: order-priority mix per line class (l_linestatus stands
    in for shipmode) over a one-year window. Date filter pushes to the
    lineitem scan; the orders join shuffles on orderkey; both counts are
    conditional sums in ONE agg pass (never two joins)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# 108. q13_order_count_distribution — distribution of counts (Q13 shape)
# --------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    ) GROUP BY 1
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: how many customers placed N orders — LEFT join so
    zero-order customers survive into the N=0 bucket, then two stacked
    aggs. The second agg's input is one row per customer, so the heavy
    shuffle happens exactly once, on custkey; the distribution agg is
    near-free (distinct c_count values ≪ customers)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# 109. q16_part_supplier_variety — anti-join + count distinct (Q16 shape)
# --------------------------------------------------------------------------
@register(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: supplier variety per (brand, type, size) slice,
    excluding blacklisted suppliers (negative acctbal stands in for the
    complaints filter). The NOT IN runs as a broadcast LEFT-ANTI join —
    null-safe and O(1) per probe — and the count-distinct shuffles
    (brand, type, size, suppkey) first, so partial aggregation dedups
    map-side."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# 110. q17_small_qty_revenue — avg-subquery-below-join (Q17 shape)
# --------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    oracle="""
    WITH fp AS (
      SELECT p_partkey FROM part
      WHERE p_brand = 'Brand#13' AND p_type = 'SMALL'
    ),
    fl AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN fp ON p_partkey = l_partkey
    ),
    avgq AS (
      SELECT l_partkey AS ap, AVG(l_quantity) AS avg_qty FROM fl GROUP BY 1
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                 AS DOUBLE) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_items
    FROM fl JOIN avgq ON ap = l_partkey
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost if small-quantity orders of one brand
    slice were dropped. The correlated AVG subquery becomes a per-part
    agg joined back; the part filter is broadcast-applied BELOW both
    branches (per-part avg is unchanged by restricting to those parts),
    so only the slice's lineitems are read twice — and both branches
    share one exchange on l_partkey."""
    fp = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#13") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    l = load(spark, sf_dir, "lineitem")
    fl = l.join(F.broadcast(fp), l.l_partkey == fp.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgq = fl.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        fl.join(avgq, fl.l_partkey == avgq.ap)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
                    .cast("double") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# 111. q19_disjunctive_revenue — disjunctive predicate pushdown (Q19 shape)
# --------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
             AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under three OR'd brand/size/quantity clauses.
    The part-only disjuncts (brand, size) can't individually push below
    the join, but their UNION envelope prunes the broadcast build side,
    and the full disjunction evaluates post-join inside codegen — one
    scan each, zero extra shuffles."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(c1 | c2 | c3).agg(
        F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(38,6)")), 2).cast("double").alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------
# 112. q20_excess_qty_suppliers — nested-semi-join supplier slice (Q20 shape)
# --------------------------------------------------------------------------
@register(
    "q20_excess_qty_suppliers",
    oracle="""
    WITH fp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    heavy AS (
      SELECT l_suppkey FROM lineitem
      JOIN fp ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 40
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s_suppkey
    """,
)
def q20_excess_qty_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who shipped excess quantity of a part slice
    in one year (sum-per-(supp, part) > threshold stands in for the
    availqty comparison). The nested IN chain runs inside-out: part
    filter broadcast into lineitem, one (supp, part) agg, then the tiny
    survivor set LEFT-SEMI-joins supplier — the big table is aggregated
    once and never re-probed."""
    fp = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        l.join(F.broadcast(fp), l.l_partkey == fp.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# 113. q21_sole_failing_supplier — double-correlated EXISTS (Q21 shape)
# --------------------------------------------------------------------------
@register(
    "q21_sole_failing_supplier",
    oracle="""
    WITH fl AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_returnflag
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_ret_supp,
             MAX(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS culprit
      FROM fl GROUP BY 1
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order p JOIN supplier s ON s.s_suppkey = p.culprit
    WHERE p.n_ret_supp = 1 AND p.n_supp > 1
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers solely responsible for a failed order
    (returnflag 'R' stands in for late receipt — the schema has no
    commit/receipt dates). The EXISTS(other supplier) AND NOT
    EXISTS(other failing supplier) pair collapses into per-order
    aggregates — distinct-supplier and distinct-failing-supplier counts
    plus the culprit id — instead of two correlated self-joins of
    lineitem; at 100 TB that's one keyed shuffle of the joined rows
    versus three."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    fl = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # Two countDistincts over different expressions used to plan as an
    # Expand (every joined row tripled with a gid, THEN shuffled on a
    # 4-column key — plans/r12/q21_..._before.txt op (9)). A pair-level
    # pre-aggregation computes the same three quantities while shuffling
    # each joined row ONCE on (orderkey, suppkey), map-side-combined
    # (guide §2.3 "aggregate before you shuffle"); the second agg sees
    # only the deduped pairs. count()/max() skip NULL suppkeys exactly
    # as COUNT(DISTINCT ...) does.
    pairs = fl.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    ret_supp = F.when(F.col("has_r") == 1, F.col("l_suppkey"))
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("l_suppkey").alias("n_supp"),
        F.count(ret_supp).alias("n_ret_supp"),
        F.max(ret_supp).alias("culprit"),
    )
    s = load(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_ret_supp") == 1) & (F.col("n_supp") > 1))
        .join(F.broadcast(s), F.col("culprit") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# 198. point_in_range_join — range join via bucketing (no native Spark op)
# --------------------------------------------------------------------------
PR_BUCKET = 64


@register(
    "point_in_range_join",
    oracle="""
    WITH r AS (
      SELECT o_orderkey AS id, o_orderkey * 10 AS s,
             o_orderkey * 10 + 5 + (o_custkey % 30) AS e
      FROM orders WHERE o_orderstatus IN ('O', 'P')
    ),
    d AS (SELECT 10 * MAX(o_orderkey) + 36 AS dom FROM orders),
    pts AS (
      SELECT event_id AS pid,
             CAST(round(value * 100) AS BIGINT) * dom // 100000 AS p
      FROM events, d
    ),
    m AS (
      SELECT pid, COUNT(*) AS nr, MIN(id) AS fr
      FROM pts JOIN r ON p BETWEEN s AND e
      GROUP BY pid
    )
    SELECT pts.pid, CAST(pts.p AS BIGINT) AS p,
           CAST(COALESCE(m.nr, 0) AS BIGINT) AS n_ranges,
           CAST(m.fr AS BIGINT) AS first_range
    FROM pts LEFT JOIN m ON m.pid = pts.pid
    """,
)
def point_in_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval enrichment join — the range-join shape Spark
    has NO native operator for (a raw `p BETWEEN s AND e` theta-join
    plans as BroadcastNestedLoop/cartesian — O(points × ranges)).
    The scalable rewrite: explode each interval onto the fixed-width
    buckets it spans, bucket the points, equi-join on the bucket
    (shuffle hash join), then apply the exact BETWEEN as a post-filter
    — O(points + ranges·k) with k = avg buckets per interval (≤2 at
    this width). Same bucketing idiom as overlapping_ranges (#14),
    here in its point-probe form — the event-to-session / tick-to-bar
    enrichment every time-series pipeline runs.

    Points are synthesized from event value-cents scaled onto the
    range domain with integer arithmetic (exact on both engines); the
    domain bound rides a 1-row broadcast. Unmatched points survive
    with n_ranges = 0 (left join) — at 100 TB the unmatched side is
    the common case and must not force a second scan."""
    o = load(spark, sf_dir, "orders")
    r = o.filter(F.col("o_orderstatus").isin("O", "P")).select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") * 10).alias("s"),
        (F.col("o_orderkey") * 10 + 5 + F.col("o_custkey") % 30).alias("e"),
    )
    dom = o.agg((10 * F.max("o_orderkey") + 36).alias("dom"))
    pts = (
        load(spark, sf_dir, "events")
        .crossJoin(F.broadcast(dom))
        .select(
            F.col("event_id").alias("pid"),
            F.expr(
                "CAST(round(value * 100) AS BIGINT) * dom DIV 100000"
            ).alias("p"),
        )
    )
    rb = r.select(
        "id", "s", "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / PR_BUCKET),
                F.floor(F.col("e") / PR_BUCKET),
            )
        ).alias("bucket"),
    )
    pb = pts.withColumn("bucket", F.floor(F.col("p") / PR_BUCKET))
    m = (
        pb.join(rb, "bucket")
        .filter(F.col("p").between(F.col("s"), F.col("e")))
        .groupBy("pid")
        .agg(F.count("*").alias("nr"), F.min("id").alias("fr"))
    )
    return pts.join(m, "pid", "left").select(
        "pid",
        F.col("p").cast("long").alias("p"),
        F.coalesce(F.col("nr"), F.lit(0)).cast("long").alias("n_ranges"),
        F.col("fr").cast("long").alias("first_range"),
    )
