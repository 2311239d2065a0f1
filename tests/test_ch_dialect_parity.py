"""Dialect-shim parity against the reference tree (VERDICT r5 stretch
#10): extract EVERY SQL SELECT template literal actually present in the
reference's JS sources, bind its parameters the way the reference's
clients do (positional $N, interpolated ${...}, ClickHouse {name:Type}
server-side params), translate with IndexerAPI.ch_sql, and RUN each one
on Spark over reference-DDL-faithful views. Dialect drift in a future
reference version then surfaces as a test failure here, not as a user's
broken query.

The fixture views carry the column set of the reference's own
init_clickhouse.js DDL (work_queue/failed_blocks/index_state/blocks)
plus the extra columns two monitor queries reference beyond that DDL
(failed_blocks.height, failed_txs.*) — the monitor predates the DDL's
rename and the reference ships it as-is, so the shim is tested against
what the strings actually say.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from zigchain_indexer_clickhouse_spark.api import IndexerAPI

_REF = Path("/root/reference")
_FILES = [
    "src/database/clickhouse_queries.js",
    "src/core/orchestrator.js",
    "src/core/worker.js",
    "scripts/monitor_indexer.js",
    "scripts/retry_failed.js",
    "src/database/partition.js",
]

# placeholders whose NAME marks them as timestamps in the reference's
# call sites (interpolated as quoted datetimes there)
_TIME_HINT = re.compile(r"ago|time|_at", re.IGNORECASE)


def _extract_selects() -> list[tuple[str, str]]:
    out = []
    for rel in _FILES:
        p = _REF / rel
        if not p.exists():
            continue
        for m in re.finditer(r"`([^`]*)`", p.read_text(), re.S):
            s = m.group(1)
            if re.search(r"\bSELECT\b", s) and not s.strip().startswith("CREATE"):
                out.append((rel, " ".join(s.split())))
    return out


def _bind(sql: str) -> str:
    """Parameter binding, as the reference's DB clients do before the
    string reaches the engine: $N positionals, ${js} interpolations,
    {name:Type} CH params. Time-named placeholders bind to a timestamp
    literal, everything else to 1."""

    def js_sub(m):
        name = m.group(1)
        if _TIME_HINT.search(name):
            return "TIMESTAMP '2020-01-01 00:00:00'"
        return "1"

    sql = re.sub(r"\$\{\s*([^}]*?)\s*\}", js_sub, sql)
    sql = re.sub(r"\{\w+:\w+\}", "1", sql)
    sql = re.sub(r"\$\d+", "1", sql)
    return sql


_SELECTS = _extract_selects()


@pytest.fixture(scope="module")
def ref_views(spark):
    """Views matching the reference DDL (init_clickhouse.js:59-107)
    plus the monitor/retry extras, one synthetic row each so joins and
    aggregates exercise real rows."""
    ddl = {
        "index_state": (
            "index_name string, last_processed_height long, "
            "updated_at timestamp"
        ),
        "work_queue": (
            "id long, start_height long, end_height long, status string, "
            "created_at timestamp, updated_at timestamp, "
            "error_message string"
        ),
        "failed_blocks": (
            "id long, block_height long, height long, error_type string, "
            "error_message string, retry_count int, max_retries int, "
            "first_failed_at timestamp, last_retry_at timestamp, "
            "next_retry_at timestamp, worker_id string, status string"
        ),
        "blocks": "height long, created_at timestamp",
        "transactions_raw": "tx_hash string, height long",
        "failed_txs": (
            "tx_hash string, height long, attempts int, error string, "
            "next_retry_at timestamp, created_at timestamp"
        ),
    }
    from datetime import datetime

    ts = datetime(2021, 6, 1)
    # string identity columns hold numeric-looking values so an
    # integer-bound positional param ($1 → 1) coerces instead of
    # failing the ANSI string→int cast
    rows = {
        "index_state": [("1", 10, ts)],
        "work_queue": [(1, 1, 100, "pending", ts, ts, None)],
        "failed_blocks": [
            (1, 5, 5, "rpc", "boom", 0, 5, ts, ts, ts, "w1", "pending")
        ],
        "blocks": [(1, ts)],
        "transactions_raw": [("ab", 1)],
        "failed_txs": [("ab", 1, 0, "boom", ts, ts)],
    }
    for name, schema in ddl.items():
        spark.createDataFrame(rows[name], schema).createOrReplaceTempView(name)
    yield
    for name in ddl:
        spark.catalog.dropTempView(name)


@pytest.mark.parametrize(
    "rel,sql",
    _SELECTS,
    ids=[f"{r.split('/')[-1]}:{i}" for i, (r, _) in enumerate(_SELECTS)],
)
def test_reference_select_runs_through_shim(spark, ref_views, rel, sql):
    if "pg_class" in sql:
        pytest.skip("PG catalog probe — no engine surface, by design")
    translated = IndexerAPI.ch_sql(_bind(sql))
    # every reference read must ANALYZE and EXECUTE on Spark
    spark.sql(translated).collect()


def test_extraction_found_the_reference_surface():
    """If the reference moves its SQL, fail loudly instead of silently
    testing nothing."""
    if not _REF.exists():
        pytest.skip("reference tree not present")
    assert len(_SELECTS) >= 25, len(_SELECTS)
