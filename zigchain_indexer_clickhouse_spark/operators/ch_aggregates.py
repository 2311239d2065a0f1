"""ClickHouse aggregate-function analogs that had no twin yet
(SURVEY.md §2.2 #162-163): ``topK()`` heavy hitters and the
``sumMap()`` map-valued aggregate.

- ``topK(k)`` in ClickHouse is a SpaceSaving sketch: approximate, but
  the items it exists to find — the ones above a frequency threshold —
  are recoverable EXACTLY with the classic two-pass scheme: a
  Misra-Gries pass produces a small candidate superset (the MG
  guarantee: every item with true count > N/(m+1) survives an m-counter
  summary, and MG summaries merge by count-sum + shrink), then an exact
  counting pass restricted to the candidates verifies. The output is
  the deterministic set {token : count > N/K}, so a plain SQL
  GROUP BY/HAVING oracle replays it — the sketch only bounds MEMORY,
  never changes the answer.
- ``sumMap`` sums map values per key across rows (ClickHouse's *-Map
  combinator family). Spark-first that is a two-level keyed aggregate
  with the map re-assembled in expression land; the oracle rebuilds the
  identical JSON rendering with an ordered string_agg.

Determinism: the heavy-hitter verify pass is exact counting (partition
layout cannot change the answer — gated in
tests/test_partition_invariance.py); sumMap entries are sorted by key
before serialization on both engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

# Heavy-hitter threshold: report tokens with count > N / HH_K.
HH_K = 50
# Misra-Gries counters per partition. The MG undercount bound is
# N_p/(SKETCH_M+1) per partition (ΣN_p = N across partitions), so any
# token with global count > N/HH_K has a positive merged estimate as
# long as SKETCH_M + 1 > HH_K; 4× headroom keeps candidate sets tiny
# without ever risking the superset guarantee.
SKETCH_M = 4 * HH_K


def _mg_shrink(counts: dict[str, int], m: int) -> dict[str, int]:
    """Shrink a count dict to ≤ m entries, Misra-Gries style: subtract
    the (m+1)-th largest count from everything and drop non-positives.
    This is the standard MG MERGE step (Agarwal et al., "Mergeable
    Summaries"): each shrink under-counts every survivor by at most the
    subtracted pivot, and the pivots across a partition sum to
    ≤ N_p/(m+1)."""
    if len(counts) <= m:
        return counts
    pivot = sorted(counts.values(), reverse=True)[m]
    return {t: c - pivot for t, c in counts.items() if c > pivot}


# --------------------------------------------------------------------------
# 162. heavy_hitters_topk — ClickHouse topK(): exact two-pass heavy hitters
# --------------------------------------------------------------------------
@register(
    "heavy_hitters_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    total AS (SELECT COUNT(*) AS n FROM tok)
    SELECT token, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * 1000000 // n AS BIGINT) AS share_ppm
    FROM counts, total
    WHERE cnt * {HH_K} > n
    """,
)
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topK``-style heavy hitters over the corpus token
    stream, computed EXACTLY in two passes: (1) a per-partition
    Misra-Gries sketch ({SKETCH_M} counters, Arrow-batched — the only
    state that ever lives outside the JVM is one ≤{SKETCH_M}-entry
    dict per partition) emits a candidate superset of every token with
    count > N/{HH_K}; (2) the exact pass re-counts ONLY candidate
    tokens (broadcast semi-join prunes the stream before the exchange)
    and filters against the true total.

    Scale shape: pass 1 is map-only (zero shuffle, ≤{SKETCH_M} rows
    out per partition); pass 2's exchange carries partial counts for
    candidate tokens only — at 100 TB the full-vocabulary aggregate
    (billions of distinct tokens) is never materialized, which is the
    entire point of the sketch. The final HAVING joins a 1-row total.
    The sketch bounds memory, not correctness: the verify pass is
    exact counting, so partition layout cannot change the answer."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.trim("text"), " ")).alias("token"))

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["token"].value_counts().items():
                counts[t] = counts.get(t, 0) + int(c)
            counts = _mg_shrink(counts, SKETCH_M)
        yield pd.DataFrame({"token": list(counts.keys())})

    candidates = (
        tok.mapInPandas(mg_partition, schema="token string").distinct()
    )
    total = tok.agg(F.count("*").alias("n"))
    return (
        tok.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * HH_K > F.col("n"))
        .select(
            "token",
            "cnt",
            ((F.col("cnt") * 1_000_000) / F.col("n"))
            .cast("long")
            .alias("share_ppm"),
        )
    )


# --------------------------------------------------------------------------
# 163. sum_map_daily — ClickHouse sumMap() / -Map combinator analog
# --------------------------------------------------------------------------
@register(
    "sum_map_daily",
    oracle="""
    WITH per AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             COUNT(*) AS cnt,
             SUM(CAST(round(value * 100) AS BIGINT)) AS val_c
      FROM events GROUP BY 1, 2
    )
    SELECT day,
           '[' || string_agg(
             '{"k":"' || event_type || '","cnt":' || cnt
               || ',"val_c":' || val_c || '}',
             ',' ORDER BY event_type) || ']' AS sum_map,
           CAST(COUNT(*) AS INT) AS n_keys
    FROM per GROUP BY day
    """,
)
def sum_map_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap`` (the *-Map combinator family): per day,
    sum counts and value-cents PER MAP KEY (event_type) and return the
    key→totals map, serialized as key-sorted JSON so both engines
    render one canonical string.

    Plan: two keyed aggregates — (day, key) partial sums collapse
    map-side, then a day-keyed re-agg assembles the map in expression
    land (sort_array over structs → to_json; key sets are distinct per
    day so the sort is total). Both exchanges carry narrow integer
    rows; the map never exceeds the key cardinality. This is exactly
    how CH maintains sumMap AggregatingMergeTree states: mergeable
    per-key partials, final map assembly at read."""
    e = load(spark, sf_dir, "events")
    per = (
        e.groupBy(
            F.col("ts").cast("date").alias("day"),
            F.col("event_type").alias("k"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("val_c"),
        )
    )
    return (
        per.groupBy("day")
        .agg(
            F.to_json(
                F.sort_array(F.collect_list(F.struct("k", "cnt", "val_c")))
            ).alias("sum_map"),
            F.count("*").cast("int").alias("n_keys"),
        )
    )
