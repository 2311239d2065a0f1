"""Central query registry.

Every operator from SURVEY.md §2 registers itself here with

    @register("name", oracle="SELECT ... AS same_alias ...")
    def name(spark, sf_dir) -> DataFrame: ...

``oracle`` is the DuckDB-runnable ANSI SQL the driver compares against
(tables pre-registered as views). Omit it for non-SQL-expressible ops —
the driver then records a rows-only check.

Column-name discipline: the driver sorts columns by NAME before hashing
values, so every computed column must carry the same alias in the Spark
plan and the oracle SQL. Float aggregates are ROUND()ed identically on
both sides to dodge summation-order ulp drift.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register queries on import. Order = SURVEY.md §2 order.
_MODULES = (
    "zigchain_indexer_clickhouse_spark.operators.indexer_core",
    "zigchain_indexer_clickhouse_spark.operators.queue_analytics",
    "zigchain_indexer_clickhouse_spark.operators.olap",
    "zigchain_indexer_clickhouse_spark.operators.dedup",
    "zigchain_indexer_clickhouse_spark.operators.similarity",
    "zigchain_indexer_clickhouse_spark.operators.text_analysis",
    "zigchain_indexer_clickhouse_spark.operators.multimodal",
    "zigchain_indexer_clickhouse_spark.operators.curation",
    "zigchain_indexer_clickhouse_spark.operators.data_mix",
    "zigchain_indexer_clickhouse_spark.operators.engine_modifiers",
    "zigchain_indexer_clickhouse_spark.operators.corpus_quality",
    "zigchain_indexer_clickhouse_spark.operators.ch_idioms",
    "zigchain_indexer_clickhouse_spark.operators.ch_aggregates",
    "zigchain_indexer_clickhouse_spark.operators.statistics",
    "zigchain_indexer_clickhouse_spark.operators.timeseries",
    "zigchain_indexer_clickhouse_spark.operators.clustering",
    "zigchain_indexer_clickhouse_spark.operators.retrieval",
    "zigchain_indexer_clickhouse_spark.operators.segments",
    "zigchain_indexer_clickhouse_spark.operators.corpus_prep",
    "zigchain_indexer_clickhouse_spark.operators.corpus_transform",
    "zigchain_indexer_clickhouse_spark.operators.matviews",
    "zigchain_indexer_clickhouse_spark.operators.funnel",
    "zigchain_indexer_clickhouse_spark.operators.olap_extra",
    "zigchain_indexer_clickhouse_spark.operators.olap_shapes",
    "zigchain_indexer_clickhouse_spark.operators.orchestration",
    "zigchain_indexer_clickhouse_spark.sources.rpc_json",
    "zigchain_indexer_clickhouse_spark.sources.tx_decode",
    "zigchain_indexer_clickhouse_spark.sources.rpc_fetch",
    "zigchain_indexer_clickhouse_spark.sources.landing",
    "zigchain_indexer_clickhouse_spark.sources.partitioned_write",
    "zigchain_indexer_clickhouse_spark.sources.bucketed",
    "zigchain_indexer_clickhouse_spark.streaming.event_stream",
)

_loaded = False

# Names that already hold a green row in CORRECTNESS_r01.json (baked-in
# fallback; _verified_names() below extends it from every
# CORRECTNESS_r*.json found in the repo root). The driver's per-round
# gate stopped after the first 50 registration-order entries in round
# 1, leaving the rest formally unverified; queries() therefore yields
# never-verified names FIRST so a capped gate spends its budget where
# no hard signal exists yet (VERDICT.md round 1, item "Next round #1").
_VERIFIED_R01 = frozenset({
    "ann_cosine_topk", "ann_lsh_bucketed", "attr_flatten", "attrs_kv",
    "attrs_map", "db_stats", "dedup_clusters", "dedup_exact",
    "dedup_exact_substring", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "doc_fingerprint", "duplicate_ranges",
    "embedding_centroids", "embedding_near_dup", "event_explode",
    "failed_block_backoff", "gap_detection", "height_partition",
    "index_state_latest", "ingest_blocks", "lang_id", "looping_ranges",
    "max_height", "maybe_b64_decode", "message_actions",
    "monitor_health_report", "overlapping_ranges", "pending_work_topn",
    "q1_pricing_summary", "q3_top_unshipped", "q5_local_volume",
    "quality_score", "queue_status_counts", "range_split",
    "recent_activity", "replacing_dedup", "semdedup", "sessionize",
    "stale_detection", "tfidf_top_terms", "time_bucket_rollup",
    "token_count", "top_users_by_value", "tx_decode", "tx_hash",
    "tx_hash_lookup", "type_route_message", "type_route_wasm",
})


# Queries measured ≥2s at sf0.01 (gate profile, round 2): table writes,
# streaming drains, iterative clustering. Deferred within their tier so
# a time-capped gate verifies the most entries per second.
_EXPENSIVE = frozenset({
    "tx_hash_bucketed_lookup", "partitioned_write_readback",
    "ingest_pipeline_full", "bucketed_colocated_join",
    "multimodal_pipeline", "ann_ivf_coarse",
    "stream_event_counts", "stream_dedup", "stream_type_route",
    "stream_mv_daily", "stream_user_state", "stream_sessionize",
    "stream_static_enrich", "stream_block_ingest", "landing_ingest",
    "stream_agg_states", "stream_heavy_hitters", "stream_attribution",
    "ingest_blocks", "dedup_simhash", "dedup_clusters",
    "overlapping_ranges", "dedup_minhash_lsh", "dedup_exact_substring",
    "tfidf_top_terms", "semdedup", "embedding_near_dup", "tx_hash",
    "kmeans_lloyd", "contamination_fuzzy", "schema_evolution_read",
    "near_dup_clusters", "dedup_keep_best", "dup_graph_triangles",
    "tx_envelope_decode",  # two persisted stages + envelope assembly
    "mad_outlier_bounds",  # two exact-median passes + bounds re-scan
    "winnowing_fingerprint",  # gram hashing + fp pair join
    "source_overlap_matrix",  # per-source shingle vocabulary join
    "curation_funnel",  # doc-keyed 2-gram agg dominates
    "msg_registry_decode",  # five encoder branches to compile + persist
    "pagerank_dupgraph",  # five chained iterations over the pair graph
    "compaction_binpack",  # two table writes + read-back audit
    "dedup_incremental",  # two shingle stages + band join + verify
    "stream_gap_detection",  # streaming drain
})


_verified_cache: frozenset[str] | None = None


# Queries whose SEMANTICS or verification tier changed in round 4
# (semdedup cluster capping wired into the engine path, ANN
# multi-probe, the streaming source's micros-generation fix, and every
# streaming query upgraded from rows-only to oracle-backed) — rows
# from rounds BEFORE 4 describe the old behavior or the weaker check,
# so only a round-4-or-later green row re-verifies them.
_REVERIFY_R04 = frozenset({
    "semdedup",
    "ann_lsh_bucketed",
    "ann_ivf_coarse",
    "stream_sessionize",
    "stream_mv_daily",
    "stream_user_state",
    "stream_agg_states",
    "stream_event_counts",
    "stream_dedup",
    "stream_type_route",
    "stream_static_enrich",
    "stream_block_ingest",
})

# Semantics changed in round 6: approx_sketch_stats went from rows-only
# to oracle-backed (exact columns + in-query bound flags), so only a
# round-6-or-later green row re-verifies it.
_REVERIFY_R06 = frozenset({"approx_sketch_stats"})


def _row_is_green(v: dict) -> bool:
    """A CORRECTNESS row counts as green iff all three matches passed,
    or it is a rows-only (no-oracle) row that produced rows."""
    if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
        return True
    return v.get("err") == "no_oracle" and bool(v.get("spark_rows"))


def _verified_names() -> frozenset[str]:
    """Every query name whose LATEST CORRECTNESS_r*.json row is green
    (per-query latest: each query's most recent round wins — a
    hash-failed row keeps the query in the never-verified tier until a
    LATER round records it green, even if that round's capped sample
    skipped it). The baked-in round-1 set seeds queries whose artifacts
    aren't shipped with the source tree; _REVERIFY_R04 names need a
    round >= 4 green row because their semantics changed in round 4."""
    global _verified_cache
    if _verified_cache is not None:
        return _verified_cache
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    # per-query (round, green) — keep the highest round seen
    latest_row: dict[str, tuple[int, bool]] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for k, v in data.items():
            if not isinstance(v, dict):
                continue
            prev = latest_row.get(k)
            if prev is None or rnd >= prev[0]:
                latest_row[k] = (rnd, _row_is_green(v))
    names = {
        k for k, (rnd, green) in latest_row.items()
        if green
        and (k not in _REVERIFY_R04 or rnd >= 4)
        and (k not in _REVERIFY_R06 or rnd >= 6)
    }
    # baked-in round-1 fallback: only for queries with NO artifact row
    names.update(
        k for k in _VERIFIED_R01
        if k not in latest_row and k not in _REVERIFY_R04
    )
    _verified_cache = frozenset(names)
    return _verified_cache


def _priority_order(names) -> list[str]:
    """Never-driver-verified names first (registration order within each
    tier, cheap before expensive), previously-verified names after."""
    verified = _verified_names()

    def tier(n: str) -> tuple[int, int]:
        return (n in verified, n in _EXPENSIVE)

    return sorted(names, key=lambda n: tier(n))


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        import_module(mod)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {n: _QUERIES[n] for n in _priority_order(_QUERIES)}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {n: _ORACLES[n] for n in _priority_order(_ORACLES)}
