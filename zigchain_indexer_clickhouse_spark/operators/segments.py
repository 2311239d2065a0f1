"""Audience-segment and training-example-prep operators
(SURVEY.md §2.2/#141, §2.3/#142): bitmap-style segment overlap and
T5-style span corruption.

- ClickHouse ships roaring-bitmap segment algebra (bitmapAnd/bitmapOr
  over user-id bitmaps) for audience overlap questions. Spark-first,
  the same answer comes from a per-user TYPE BITMASK: one distinct
  pass folds each user's event types into an int, one tiny agg counts
  mask combinations, and every pairwise intersection/union falls out
  of the ≤2^|types| mask rows in expression land — the corpus shuffles
  once, the pair math touches dozens of rows.
- Span corruption is the T5/UL2 objective prep: deterministic token
  spans swap for sentinels, targets carry the dropped spans. A pure
  narrow projection (expression-land list surgery) — the kind of
  map-side transform that runs at ingest bandwidth at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

SEG_TYPES = ("click", "view", "purchase", "error", "signup")
SPAN_LEN = 3      # tokens per corrupted span
SPAN_EVERY = 5    # corrupt every 5th span-position


# --------------------------------------------------------------------------
# 141. segment_overlap_bitmap — pairwise audience overlap via type bitmasks
# --------------------------------------------------------------------------
def _mask_sql() -> str:
    return " + ".join(
        f"MAX(CASE WHEN event_type = '{t}' THEN {1 << i} ELSE 0 END)"
        for i, t in enumerate(SEG_TYPES)
    )


def _pairs():
    for i in range(len(SEG_TYPES)):
        for j in range(i + 1, len(SEG_TYPES)):
            yield i, j


@register(
    "segment_overlap_bitmap",
    oracle=f"""
    WITH masks AS (
      SELECT user_id, {_mask_sql()} AS mask
      FROM events GROUP BY user_id
    ),
    mc AS (SELECT mask, COUNT(*) AS n FROM masks GROUP BY mask),
    pairs AS (
      {" UNION ALL ".join(
        f'''SELECT '{SEG_TYPES[i]}' AS type_a, '{SEG_TYPES[j]}' AS type_b,
            CAST(SUM(CASE WHEN (mask & {1 << i}) > 0
                           AND (mask & {1 << j}) > 0 THEN n ELSE 0 END)
                 AS BIGINT) AS n_both,
            CAST(SUM(CASE WHEN (mask & {1 << i}) > 0
                            OR (mask & {1 << j}) > 0 THEN n ELSE 0 END)
                 AS BIGINT) AS n_either
            FROM mc'''
        for i, j in _pairs()
      )}
    )
    SELECT type_a, type_b, n_both, n_either,
           CAST(n_both * 10000 // n_either AS BIGINT) AS jaccard_bp
    FROM pairs WHERE n_either > 0
    """,
)
def segment_overlap_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap for every pair of event-type segments —
    ClickHouse's ``bitmapAndCardinality / bitmapOrCardinality`` over
    per-segment user bitmaps, answered Spark-first with ONE corpus
    shuffle: fold each user's types into a bitmask (distinct-style
    agg on user_id), aggregate to ≤2^{len(SEG_TYPES)} (mask, count)
    rows, then compute all {len(list(_pairs()))} pairwise
    intersection/union cardinalities from those rows in expression
    land. Integer Jaccard (basis points) keeps the oracle exact.

    At 100 TB: the user-mask agg is the only data-sized operation
    (map-side combinable); the pair sweep reads 32 rows however many
    segments or users exist — same asymptotics as the roaring-bitmap
    approach, without native bitmap state."""
    e = load(spark, sf_dir, "events")
    mask_col = None
    for i, t in enumerate(SEG_TYPES):
        term = F.max(
            F.when(F.col("event_type") == t, F.lit(1 << i)).otherwise(0)
        )
        mask_col = term if mask_col is None else mask_col + term
    mc = (
        e.groupBy("user_id")
        .agg(mask_col.alias("mask"))
        .groupBy("mask")
        .agg(F.count("*").alias("n"))
    )
    # ALL pair cardinalities in ONE aggregate over the (mask, n) rows —
    # 2 columns per pair — then unpivoted to rows in expression land.
    # One job, one pass; the naive per-pair agg would re-run the
    # user-mask shuffle |pairs| times.
    agg_cols = []
    for i, j in _pairs():
        a_bit, b_bit = 1 << i, 1 << j
        agg_cols.append(
            F.sum(
                F.when(
                    (F.col("mask").bitwiseAND(a_bit) > 0)
                    & (F.col("mask").bitwiseAND(b_bit) > 0),
                    F.col("n"),
                ).otherwise(0)
            ).cast("long").alias(f"both_{i}_{j}")
        )
        agg_cols.append(
            F.sum(
                F.when(
                    (F.col("mask").bitwiseAND(a_bit) > 0)
                    | (F.col("mask").bitwiseAND(b_bit) > 0),
                    F.col("n"),
                ).otherwise(0)
            ).cast("long").alias(f"either_{i}_{j}")
        )
    wide = mc.agg(*agg_cols)
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(SEG_TYPES[i]).alias("type_a"),
                F.lit(SEG_TYPES[j]).alias("type_b"),
                F.col(f"both_{i}_{j}").alias("n_both"),
                F.col(f"either_{i}_{j}").alias("n_either"),
            )
            for i, j in _pairs()
        ]
    )
    pairs = wide.select(F.explode(pair_structs).alias("p")).select("p.*")
    return pairs.filter(F.col("n_either") > 0).select(
        "type_a",
        "type_b",
        "n_both",
        "n_either",
        F.expr("CAST(n_both * 10000 DIV n_either AS BIGINT)").alias(
            "jaccard_bp"
        ),
    )


# --------------------------------------------------------------------------
# 142. span_corruption — T5-style denoising objective prep
# --------------------------------------------------------------------------
@register(
    "span_corruption",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    marked AS (
      SELECT doc_id, len(toks) AS n_tokens,
             list_transform(generate_series(1, len(toks)),
               i -> CASE
                 WHEN ((i - 1) // {SPAN_LEN}) % {SPAN_EVERY} = 0
                  AND (i - 1) % {SPAN_LEN} = 0
                 THEN '<extra_id_' || CAST((i - 1) // ({SPAN_LEN} * {SPAN_EVERY})
                      AS VARCHAR) || '>'
                 WHEN ((i - 1) // {SPAN_LEN}) % {SPAN_EVERY} = 0
                 THEN ''
                 ELSE toks[i] END) AS inp,
             list_transform(generate_series(1, len(toks)),
               i -> CASE WHEN ((i - 1) // {SPAN_LEN}) % {SPAN_EVERY} = 0
                    THEN toks[i] ELSE '' END) AS tgt
      FROM tok
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           array_to_string(list_filter(inp, x -> x <> ''), ' ') AS corrupted,
           array_to_string(list_filter(tgt, x -> x <> ''), ' ') AS targets
    FROM marked
    """,
)
def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption prep (arXiv:1910.10683 §3.1.4,
    deterministic variant): every {SPAN_EVERY}th {SPAN_LEN}-token span
    is replaced by a numbered sentinel in the input and moved to the
    target sequence. Deterministic span placement (position math, not
    RNG) so corpus rebuilds produce identical examples and the oracle
    replays them.

    Plan: pure narrow projection — the span surgery happens in
    expression land (transform over token indices + filter + join),
    zero shuffle, runs at scan bandwidth on any corpus size. The
    sentinel ids are span-ordinal, matching the T5 convention."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.trim("text"), " ").alias("toks")
    )
    sl, se = SPAN_LEN, SPAN_EVERY
    idx = F.sequence(F.lit(1), F.size("toks"))
    inp = F.transform(
        idx,
        lambda i: F.when(
            (((i - 1) / sl).cast("long") % se == 0) & ((i - 1) % sl == 0),
            F.concat(
                F.lit("<extra_id_"),
                ((i - 1) / (sl * se)).cast("long").cast("string"),
                F.lit(">"),
            ),
        )
        .when(((i - 1) / sl).cast("long") % se == 0, F.lit(""))
        .otherwise(F.element_at("toks", i.cast("int"))),
    )
    tgt = F.transform(
        idx,
        lambda i: F.when(
            ((i - 1) / sl).cast("long") % se == 0,
            F.element_at("toks", i.cast("int")),
        ).otherwise(F.lit("")),
    )
    return toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.array_join(F.filter(inp, lambda x: x != ""), " ").alias("corrupted"),
        F.array_join(F.filter(tgt, lambda x: x != ""), " ").alias("targets"),
    )
