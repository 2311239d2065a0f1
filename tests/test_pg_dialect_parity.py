"""PostgreSQL dialect-shim parity for the monitor scripts (VERDICT r9
item 8 / r10 item 6): extract EVERY SQL string the reference's
operational tooling sends through node-pg — scripts/monitor_indexer.js
(health walk, gap probe, loop detection) and scripts/test_connection.js
(catalog probe, index-state peek) — bind positional $N parameters the
way the call sites do, and RUN each one verbatim through
IndexerAPI.pg_query over a seeded engine instance. Then pin behavior:
the monitor strings' answers must equal the engine's own DataFrame
views computed directly.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.api import IndexerAPI

_REF = Path("/root/reference")
_FILES = ["scripts/monitor_indexer.js", "scripts/test_connection.js"]


def _extract_selects() -> list[tuple[str, str]]:
    """Every SELECT the scripts send: backtick template literals AND
    the single-quoted one-liners ('SELECT NOW() ...')."""
    out = []
    for rel in _FILES:
        p = _REF / rel
        if not p.exists():
            continue
        text = p.read_text()
        for m in re.finditer(r"`([^`]*)`", text, re.S):
            s = m.group(1)
            if re.search(r"\bSELECT\b", s):
                out.append((rel, " ".join(s.split())))
        for m in re.finditer(r"query\(\s*'([^']*SELECT[^']*)'", text):
            out.append((rel, " ".join(m.group(1).split())))
    return out


_SELECTS = _extract_selects()


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    """An engine instance with every monitor-visible table seeded:
    queue items across statuses (one stale-processing, one duplicated
    pending pair), failed blocks, index state, and raw blocks /
    transactions_raw inserts — timestamps straddle NOW() so the
    'last hour' / '30 minutes' predicates bite both ways."""
    a = IndexerAPI(spark, str(tmp_path_factory.mktemp("pgapi")))
    now = datetime.now()
    a.insert_work_queue([
        {"id": 1, "start_height": 1, "end_height": 100},
        {"id": 2, "start_height": 101, "end_height": 200,
         "status": "processing"},
        {"id": 3, "start_height": 201, "end_height": 300,
         "status": "completed"},
        # duplicate pending range (the monitor's duplicate probe)
        {"id": 4, "start_height": 1, "end_height": 100},
    ])
    a.add_failed_block(55, "rpc", "boom", "w1")
    a.add_failed_block(55, "rpc", "boom again", "w1")
    a.add_failed_block(77, "decode", "bad bytes", "w2")
    a.update_last_indexed_height("decoded_indexer", 12)
    a.update_last_indexed_height("orchestrator", 15)
    blocks = spark.createDataFrame(
        [(h, now - timedelta(minutes=5)) for h in (1, 2, 3, 5, 7, 9)]
        + [(h, now - timedelta(hours=3)) for h in (10, 11)],
        "height long, created_at timestamp",
    )
    a.insert("blocks", blocks)
    a.insert("transactions_raw", spark.createDataFrame(
        [("ab", 1, now), ("cd", 2, now)],
        "tx_hash string, height long, created_at timestamp",
    ))
    return a


@pytest.mark.parametrize(
    "rel,sql",
    _SELECTS,
    ids=[f"{r.split('/')[-1]}:{i}" for i, (r, _) in enumerate(_SELECTS)],
)
def test_monitor_select_runs_verbatim(api, rel, sql):
    """Every monitor/test-connection SELECT must analyze AND execute
    through pg_query. The gap probe's $1 binds like its call site
    (Math.min(maxHeight, 10000))."""
    params = [10] if "$1" in sql else None
    api.pg_query(sql, params).collect()


def test_extraction_found_the_monitor_surface():
    """The extraction must keep seeing the scripts' query surface —
    if the reference moves its SQL, this fails loudly instead of the
    parametrized test silently shrinking."""
    assert len(_SELECTS) >= 13, [s[:60] for _, s in _SELECTS]
    joined = " ".join(s for _, s in _SELECTS)
    for marker in ("generate_series", "EXTRACT(EPOCH",
                   "information_schema.tables", "INTERVAL '1 hour'"):
        assert marker in joined, marker


def test_queue_status_counts_equal_engine_view(api):
    got = {
        (r["status"], r["count"]) for r in api.pg_query(
            "SELECT status, COUNT(*) as count, "
            "MIN(start_height) as min_height, "
            "MAX(end_height) as max_height "
            "FROM work_queue GROUP BY status ORDER BY status").collect()
    }
    want = {
        (r["status"], r["count"])
        for r in api.work_queue().groupBy("status")
        .agg(F.count("*").alias("count")).collect()
    }
    assert got == want and ("pending", 2) in got


def test_failed_blocks_breakdown_equals_engine_view(api):
    rows = api.pg_query(
        "SELECT status, error_type, COUNT(*) as count, "
        "MIN(height) as min_height, MAX(height) as max_height "
        "FROM failed_blocks GROUP BY status, error_type "
        "ORDER BY status, error_type").collect()
    got = {(r["error_type"], r["count"], r["min_height"],
            r["max_height"]) for r in rows}
    # engine view: 55 retried twice merges to ONE row (attempts=2)
    assert got == {("rpc", 1, 55, 55), ("decode", 1, 77, 77)}
    assert all(r["status"] == "pending" for r in rows)


def test_gap_probe_equals_engine_blocks(api):
    row = api.pg_query(
        "WITH height_series AS ( "
        "  SELECT generate_series(1, $1) AS expected_height "
        "), missing_blocks AS ( "
        "  SELECT hs.expected_height as missing_height "
        "  FROM height_series hs "
        "  LEFT JOIN blocks b ON hs.expected_height = b.height "
        "  WHERE b.height IS NULL "
        ") SELECT COUNT(*) as gap_count, "
        "MIN(missing_height) as first_gap, "
        "MAX(missing_height) as last_gap FROM missing_blocks",
        [11]).collect()[0]
    # seeded heights 1,2,3,5,7,9,10,11 → missing 4,6,8 in [1..11]
    assert (row["gap_count"], row["first_gap"], row["last_gap"]) \
        == (3, 4, 8)


def test_index_state_and_recent_activity(api):
    st = {r["index_name"]: r["last_processed_height"] for r in api.pg_query(
        "SELECT index_name, last_processed_height, updated_at "
        "FROM index_state ORDER BY updated_at DESC").collect()}
    assert st == {"decoded_indexer": 12, "orchestrator": 15}
    recent = api.pg_query(
        "SELECT COUNT(*) as recent_blocks FROM blocks "
        "WHERE created_at > NOW() - INTERVAL '1 hour'").collect()[0]
    assert recent["recent_blocks"] == 6  # the 3-hour-old pair excluded


def test_information_schema_probe_lists_present_tables(api):
    rows = api.pg_query(
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = 'public' "
        "AND table_name IN ('blocks', 'transactions_raw', "
        "'index_state', 'work_queue', 'failed_blocks') "
        "ORDER BY table_name").collect()
    assert [r["table_name"] for r in rows] == [
        "blocks", "failed_blocks", "index_state", "transactions_raw",
        "work_queue",
    ]


def test_stuck_and_stale_epoch_arithmetic(api):
    """EXTRACT(EPOCH FROM (NOW() - updated_at))/60 translates to a
    unix_timestamp difference; freshly-seeded items are under both
    thresholds so the monitor's healthy branch fires."""
    stuck = api.pg_query(
        "SELECT COUNT(*) as stuck_count, "
        "MIN(EXTRACT(EPOCH FROM (NOW() - updated_at))/60) as min_minutes, "
        "MAX(EXTRACT(EPOCH FROM (NOW() - updated_at))/60) as max_minutes "
        "FROM work_queue WHERE status = 'processing' "
        "AND updated_at < NOW() - INTERVAL '30 minutes'").collect()[0]
    assert stuck["stuck_count"] == 0
    dup = api.pg_query(
        "SELECT COUNT(*) as duplicate_ranges FROM ( "
        "SELECT start_height, end_height FROM work_queue "
        "WHERE status = 'pending' GROUP BY start_height, end_height "
        "HAVING COUNT(*) > 1 ) duplicates").collect()[0]
    assert dup["duplicate_ranges"] == 1
