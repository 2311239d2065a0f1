"""Dataset-assembly operators for training-data pipelines
(SURVEY.md §2.3 #118-123): deterministic splits, quality-weighted and
domain-rebalanced sampling, shard-parallel shuffle order, split-leakage
checks, and length histograms.

These are the steps BETWEEN curation (curation.py) and the trainer: the
curated corpus must be split, re-weighted to a target domain mix,
shuffled into shards, and audited for train/eval leakage. Everything is
hash-deterministic (portable_hash = md5-based, bit-identical in DuckDB)
so the DuckDB oracle replays each decision exactly — no RNG state, no
sampling drift between runs, and at 100 TB a re-run assigns every
document the same split/shard/keep decision (the property that makes
incremental dataset rebuilds possible at all).

Scale notes per operator are on the functions; none of them shuffles
more than one narrow projection of the corpus, and the only windows are
per-shard (bounded width) or over a ≤n_sources aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.functions.hashing import (
    portable_hash,
    portable_hash_sql,
)
from zigchain_indexer_clickhouse_spark.plans.registry import register

# Split thresholds in percent: 90 train / 5 val / 5 test.
TRAIN_PCT, VAL_PCT = 90, 95
N_SHARDS = 16

_SPLIT_HASH = portable_hash_sql("doc_id", "'split'")
_SPLIT_SQL = f"""
  CASE WHEN ({_SPLIT_HASH}) % 100 < {TRAIN_PCT} THEN 'train'
       WHEN ({_SPLIT_HASH}) % 100 < {VAL_PCT} THEN 'val'
       ELSE 'test' END
"""


def _split_col() -> F.Column:
    h = portable_hash(F.col("doc_id"), "split") % 100
    return (
        F.when(h < TRAIN_PCT, "train").when(h < VAL_PCT, "val").otherwise("test")
    )


# --------------------------------------------------------------------------
# 118. train_val_split_hash — deterministic hash split
# --------------------------------------------------------------------------
@register(
    "train_val_split_hash",
    oracle=f"""
    SELECT doc_id, {_SPLIT_SQL} AS split
    FROM documents
    """,
)
def train_val_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment from a salted hash of the
    document id — the split survives corpus re-ingestion, appends, and
    re-ordering (row_number-based splits don't). Pure narrow projection:
    zero shuffle at any scale."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", _split_col().alias("split"))


# --------------------------------------------------------------------------
# 119. quality_weighted_sample — keep-probability ∝ quality proxy
# --------------------------------------------------------------------------
@register(
    "quality_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             least(10000, greatest(1000, n_chars * 20)) AS weight_bp
      FROM documents
    )
    SELECT doc_id, lang, CAST(weight_bp AS BIGINT) AS weight_bp
    FROM w
    WHERE ({portable_hash_sql("doc_id", "'qws'")}) % 10000 < weight_bp
    """,
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling: each doc keeps with probability
    weight_bp/10000, where the weight is a quality proxy (here length-
    derived, clamped to [10%, 100%] in basis points — integer math so
    the oracle replays bit-exactly; a real pipeline plugs any scorer
    in). The keep decision is hash-deterministic per doc — re-running
    the pipeline keeps the SAME sample, which is what makes ablations
    comparable. Narrow filter, zero shuffle."""
    d = load(spark, sf_dir, "documents")
    weight_bp = F.least(
        F.lit(10000), F.greatest(F.lit(1000), F.col("n_chars") * 20)
    )
    keep = (portable_hash(F.col("doc_id"), "qws") % 10000) < weight_bp
    return (
        d.withColumn("weight_bp", weight_bp.cast("long"))
        .filter(keep)
        .select("doc_id", "lang", "weight_bp")
    )


# --------------------------------------------------------------------------
# 120. domain_mix_rebalance — per-source sampling plan toward a target mix
# --------------------------------------------------------------------------
@register(
    "domain_mix_rebalance",
    oracle="""
    WITH per_src AS (
      SELECT source,
             COUNT(*) AS n_docs,
             1 + CAST(substr(source, 4) AS INT) % 3 AS weight
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, CAST(weight AS INT) AS weight,
           CAST((SUM(n_docs) OVER ()) * weight
                  // (SUM(weight) OVER ()) AS BIGINT) AS n_target,
           CAST(least(n_docs, (SUM(n_docs) OVER ()) * weight
                  // (SUM(weight) OVER ())) AS BIGINT) AS n_keep
    FROM per_src
    """,
)
def domain_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing plan: given per-source target weights (here a
    deterministic 1/2/3 cycle standing in for a tuned mix like
    web/books/code), compute each source's target document count and
    the achievable keep count. The heavy input collapses to one
    ≤n_sources aggregate BEFORE any window — the unpartitioned window
    runs over ~dozens of rows, not the corpus (same pattern the
    reference's tiny system-table queries use). Integer `div` keeps the
    oracle exact."""
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.count("*").alias("n_docs")).withColumn(
        "weight",
        (1 + F.substring("source", 4, 10).cast("int") % 3).cast("int"),
    )
    w = Window.partitionBy()
    n_target = F.expr(
        "CAST(total_docs * weight DIV total_weight AS BIGINT)"
    )
    return (
        per_src.withColumn("total_docs", F.sum("n_docs").over(w))
        .withColumn("total_weight", F.sum("weight").over(w))
        .withColumn("n_target", n_target)
        .withColumn(
            "n_keep", F.least(F.col("n_docs"), F.col("n_target")).cast("long")
        )
        .select("source", "n_docs", "weight", "n_target", "n_keep")
    )


# --------------------------------------------------------------------------
# 121. shard_shuffle_order — deterministic sharded training order
# --------------------------------------------------------------------------
@register(
    "shard_shuffle_order",
    oracle=f"""
    SELECT doc_id,
           CAST(({portable_hash_sql("doc_id", "'shard'")}) % {N_SHARDS}
                AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY ({portable_hash_sql("doc_id", "'shard'")}) % {N_SHARDS}
             ORDER BY ({portable_hash_sql("doc_id", "'order'")}), doc_id
           ) AS BIGINT) AS shard_pos
    FROM documents
    """,
)
def shard_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global training-order shuffle WITHOUT a global sort: docs hash
    into {N_SHARDS} shards and get a position within their shard by a
    second independent hash. Readers consume shards round-robin for an
    order that is deterministic, uniform, and seed-replayable. The plan
    is one hash shuffle + per-shard window — at 100 TB the shard count
    scales with the corpus and no single task ever sees more than one
    shard (vs row_number over everything = one-partition death)."""
    d = load(spark, sf_dir, "documents")
    shard = (portable_hash(F.col("doc_id"), "shard") % N_SHARDS).cast("int")
    order_h = portable_hash(F.col("doc_id"), "order")
    w = Window.partitionBy("shard").orderBy("order_h", "doc_id")
    return (
        d.select("doc_id", shard.alias("shard"), order_h.alias("order_h"))
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "shard_pos")
    )


# --------------------------------------------------------------------------
# 122. split_leakage_check — cross-split exact-text contamination
# --------------------------------------------------------------------------
@register(
    "split_leakage_check",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents
    ),
    assigned AS (
      SELECT sha256(text) AS th, {_SPLIT_SQL} AS split FROM corpus
    )
    SELECT a.split,
           CAST(COUNT(DISTINCT a.th) AS BIGINT) AS n_leaked_texts
    FROM assigned a
    WHERE a.split <> 'train'
      AND a.th IN (SELECT th FROM assigned WHERE split = 'train')
    GROUP BY a.split
    """,
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval leakage audit: exact texts that landed in val/test
    while an identical copy sits in train (hash splits are per-doc_id,
    so duplicated CONTENT crosses splits — the classic eval-inflation
    bug). Corpus = documents + exact copies (the dedup harness corpus),
    so known positives exist. Shape: sha2 the text once, semi-join the
    eval side against the distinct train-hash set — one equi-join on a
    32-byte key, no text ever rides the shuffle."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionAll(
        d.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )
    assigned = corpus.select(
        F.sha2("text", 256).alias("th"), _split_col().alias("split")
    )
    train = assigned.filter(F.col("split") == "train").select("th").distinct()
    return (
        assigned.filter(F.col("split") != "train")
        .join(train, "th", "leftsemi")
        .groupBy("split")
        .agg(F.countDistinct("th").alias("n_leaked_texts"))
    )


# --------------------------------------------------------------------------
# 123. length_histogram — token-length distribution for packing plans
# --------------------------------------------------------------------------
@register(
    "length_histogram",
    oracle="""
    WITH t AS (
      SELECT len(string_split(trim(text), ' ')) AS n_tokens FROM documents
    )
    SELECT CAST(n_tokens // 16 AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM t GROUP BY 1
    """,
)
def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (16-token buckets) — the input statistic
    every packing/batching plan (sequence_packing, #99) is tuned from.
    Map-side combinable agg on a handful of buckets: the exchange
    carries one row per bucket per partition."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), " "))
    return (
        d.select(n_tokens.alias("n_tokens"))
        .groupBy(F.expr("CAST(n_tokens DIV 16 AS BIGINT)").alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )


# --------------------------------------------------------------------------
# 220. domain_temperature_mix — α-smoothed multilingual sampling plan
# --------------------------------------------------------------------------
# the one irrational step (sqrt of an exact integer count) runs as the
# SAME formula text on both engines; the normalizing Σ√n is an ordered
# left fold over the ≤|langs| cells so both engines sum one permutation
_TEMP_BUDGET = 10_000


@register(
    "domain_temperature_mix",
    oracle=f"""
    WITH g AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY lang
    ),
    t AS (SELECT SUM(n_docs) AS total FROM g),
    f AS (
      SELECT list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang)),
               (a, b) -> a + b) AS denom
      FROM g
    )
    SELECT g.lang, g.n_docs,
           CAST(g.n_docs * 1000000 // t.total AS BIGINT) AS raw_share_ppm,
           CAST(floor(sqrt(CAST(g.n_docs AS DOUBLE)) / f.denom * 1000000)
                AS BIGINT) AS smoothed_share_ppm,
           CAST(floor(sqrt(CAST(g.n_docs AS DOUBLE)) / f.denom
                      * {_TEMP_BUDGET}) AS BIGINT) AS target_docs
    FROM g CROSS JOIN t CROSS JOIN f
    """,
)
def domain_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling (the mBERT/XLM-R α=0.5
    exponential smoothing, Devlin 2019 / Conneau 2020): low-resource
    languages are UP-sampled relative to their raw share by sampling
    ∝ n^α — the plan every multilingual training mix starts from.
    Emits raw vs smoothed shares (ppm) and the per-language document
    quota under a {_TEMP_BUDGET}-doc budget. Complements #120 (fixed
    target weights); here the weights derive from the data.

    Exactness: counts are exact BIGINTs; √n is the one irrational
    step, executed as the SAME formula text on both engines, and the
    normalizing Σ√n is a left fold over lang-ordered cells (the
    cramers_v discipline) so both engines add one permutation of
    ≤|langs| doubles before the ppm floor.

    Scale shape: ONE map-side-combinable lang agg collapses the
    corpus; everything downstream (fold, shares, quotas) runs on the
    ≤|langs|-row frame with two 1-row broadcasts."""
    g = load(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").alias("n_docs")
    )
    t = g.agg(F.sum("n_docs").alias("total"))
    f = g.agg(
        F.expr(
            "aggregate(sort_array(collect_list(struct(lang, "
            "sqrt(CAST(n_docs AS DOUBLE)) AS s))), CAST(0 AS DOUBLE), "
            "(a, x) -> a + x.s)"
        ).alias("denom")
    )
    return (
        g.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(f))
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.expr(
                "CAST(n_docs * 1000000 DIV total AS BIGINT)"
            ).alias("raw_share_ppm"),
            F.expr(
                "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) / denom * 1000000)"
                " AS BIGINT)"
            ).alias("smoothed_share_ppm"),
            F.expr(
                f"CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) / denom"
                f" * {_TEMP_BUDGET}) AS BIGINT)"
            ).alias("target_docs"),
        )
    )


# --------------------------------------------------------------------------
# 221. uniq_up_to_daily — ClickHouse uniqUpTo(N) analog
# --------------------------------------------------------------------------
_UNIQ_CAP = 10


@register(
    "uniq_up_to_daily",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
      FROM events
    )
    SELECT event_type, day,
           CAST(LEAST(COUNT(*), {_UNIQ_CAP + 1}) AS BIGINT) AS uniq_up_to,
           CAST(COUNT(*) > {_UNIQ_CAP} AS BIGINT) AS saturated
    FROM d GROUP BY event_type, day
    """,
)
def uniq_up_to_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo({_UNIQ_CAP})``: exact distinct users per
    (event_type, day), saturating at {_UNIQ_CAP}+1 — the "are there
    more than N distinct actors" gate (CH keeps ≤N+1 keys of state and
    answers exactly below the cap; the saturated flag is all a
    threshold consumer reads).

    Scale shape: the (type, day, user) DISTINCT collapse is the only
    corpus-sized step and it is map-side combinable (each task dedups
    locally before the exchange); the capped count and flag are
    per-group trivia. CH's bounded-state trick trades exactness above
    the cap for memory — here the distinct collapse already bounds
    the exchange, and the saturating output preserves CH's exact
    answer-envelope: equal below the cap, pinned to N+1 above."""
    d = (
        load(spark, sf_dir, "events")
        .select("event_type", F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    return d.groupBy("event_type", "day").agg(
        F.least(F.count("*"), F.lit(_UNIQ_CAP + 1))
        .cast("long").alias("uniq_up_to"),
        (F.count("*") > _UNIQ_CAP).cast("long").alias("saturated"),
    )
