"""IndexerAPI facade: the reference's database-helper surface
(clickhouse_queries.js module.exports) over append-only versioned
parquet with FINAL-at-read semantics."""

from __future__ import annotations

import pytest

from zigchain_indexer_clickhouse_spark.api import _WORK_QUEUE_SCHEMA, IndexerAPI


@pytest.fixture()
def api(spark, tmp_path):
    return IndexerAPI(spark, str(tmp_path))


def test_work_queue_lifecycle(api):
    api.insert_work_queue(
        [
            {"id": 1, "start_height": 1, "end_height": 1000},
            {"id": 2, "start_height": 1001, "end_height": 2000},
            {"id": 3, "start_height": 2001, "end_height": 3000},
        ]
    )
    assert api.count_work_queue("pending") == 3

    pending = api.get_pending_work(limit=2).collect()
    assert [r["id"] for r in pending] == [1, 2]

    # update = versioned re-append; FINAL shows only the latest state
    api.update_work_queue_status(2, "processing")
    assert api.count_work_queue("pending") == 2
    assert api.count_work_queue("processing") == 1

    api.update_work_queue_status(2, "failed", error_message="rpc timeout")
    row = api.work_queue().filter("id = 2").collect()[0]
    assert row["status"] == "failed" and row["error_message"] == "rpc timeout"

    # delete = tombstone append
    api.delete_work_queue_item(1)
    assert sorted(r["id"] for r in api.work_queue().collect()) == [2, 3]

    # raw log keeps full history (3 inserts + 2 updates + 1 delete)
    log = api._read_log("work_queue", _WORK_QUEUE_SCHEMA)
    assert log.count() == 6


def test_overlapping_ranges_probe(api):
    api.insert_work_queue(
        [
            {"id": 1, "start_height": 1, "end_height": 1000},
            {"id": 2, "start_height": 1001, "end_height": 2000, "status": "done"},
            {"id": 3, "start_height": 1500, "end_height": 2500},
        ]
    )
    hits = api.get_overlapping_ranges(900, 1600).collect()
    # id=2 overlaps but is done; id=1 and id=3 are pending and overlap
    assert sorted(r["id"] for r in hits) == [1, 3]


def test_failed_block_upsert_and_backoff(api):
    api.add_failed_block(42, "rpc", "timeout", worker_id="w1")
    api.add_failed_block(42, "rpc", "timeout again", worker_id="w2")
    api.add_failed_block(7, "decode", "bad proto")

    fb = {r["block_height"]: r for r in api.failed_blocks().collect()}
    assert fb[42]["attempts"] == 2 and fb[42]["worker_id"] == "w2"
    assert fb[7]["attempts"] == 1

    sched = {r["block_height"]: r["retry_in_s"]
             for r in api.retry_schedule().collect()}
    # min(600, 2^min(n,5)*5): n=1 → 10, n=2 → 20
    assert sched[7] == 10 and sched[42] == 20

    api.remove_failed_block(42)
    assert [r["block_height"] for r in api.failed_blocks().collect()] == [7]


def test_index_state_argmax(api):
    assert api.get_last_indexed_height() == 0
    api.update_last_indexed_height("decoded_indexer", 100)
    api.update_last_indexed_height("decoded_indexer", 250)
    api.update_last_indexed_height("raw_indexer", 999)
    assert api.get_last_indexed_height("decoded_indexer") == 250
    assert api.get_last_indexed_height("raw_indexer") == 999


def test_sql_over_final_views(api):
    api.insert_work_queue([{"id": 1, "start_height": 1, "end_height": 10}])
    api.update_work_queue_status(1, "processing")
    n = api.query(
        "SELECT COUNT(*) AS n FROM work_queue WHERE status = 'processing'"
    ).collect()[0]["n"]
    assert n == 1


def test_compact_preserves_final_state(api):
    api.insert_work_queue(
        [{"id": i, "start_height": i, "end_height": i + 9} for i in range(1, 6)]
    )
    api.update_work_queue_status(3, "done")
    api.delete_work_queue_item(5)
    before = sorted(
        (r["id"], r["status"]) for r in api.work_queue().collect()
    )
    api.compact("work_queue", _WORK_QUEUE_SCHEMA, ["id"])
    after = sorted((r["id"], r["status"]) for r in api.work_queue().collect())
    assert before == after == [
        (1, "pending"), (2, "pending"), (3, "done"), (4, "pending")
    ]


def test_split_range_parity(api):
    # splitRange (orchestrator.js:78-92): cover exactly, sizes ≤1 apart
    parts = api.split_range(1, 10, 3)
    assert parts == [(1, 4), (5, 7), (8, 10)]
    assert api.splitRange(1, 10, 3) == parts  # camelCase alias
    parts = api.split_range(1, 5, 10)  # more parts than heights → clamp
    assert parts == [(i, i) for i in range(1, 6)]


def test_camelcase_aliases(api):
    api.insertWorkQueue([{"id": 9, "start_height": 1, "end_height": 2}])
    assert api.countWorkQueue("pending") == 1
    assert api.getLastIndexedHeight() == 0
    assert api.getMaxBlockHeight() == 0


def test_version_high_water_mark_survives_restart(api, spark, tmp_path):
    """A new process (new IndexerAPI instance) must continue versioning
    ABOVE what is already on disk — wall-clock seeding could re-seed
    below it after a sub-ms write burst and resurrect stale rows."""
    api.insert_work_queue([{"id": 1, "start_height": 1, "end_height": 10}])
    api.update_work_queue_status(1, "processing")
    api.update_work_queue_status(1, "done")

    # fresh instance = restarted process; no in-memory counter carried
    api2 = IndexerAPI(spark, str(tmp_path))
    api2.update_work_queue_status(1, "failed", error_message="late")
    assert api2.work_queue().filter("id = 1").collect()[0]["status"] == "failed"

    # and the first instance still reads the same FINAL state
    assert api.work_queue().filter("id = 1").collect()[0]["status"] == "failed"


def test_auto_compact_bounds_file_count(api, tmp_path, monkeypatch):
    """Hot tables (index_state updates every block in the reference)
    must not accrete one file per append forever: after N appends the
    log auto-compacts and FINAL reads are unchanged."""
    import zigchain_indexer_clickhouse_spark.api as api_mod

    monkeypatch.setattr(api_mod, "AUTO_COMPACT_EVERY", 10)
    for h in range(1, 26):
        api.update_last_indexed_height("decoded_indexer", h)
    assert api.get_last_indexed_height("decoded_indexer") == 25

    files = list((tmp_path / "index_state").glob("*.parquet"))
    # 25 appends with compaction every 10 → far fewer than 25 data files
    assert len(files) <= 12


def test_run_with_retry_transient_then_success(api):
    """db.js retry policy: transient errors back off linearly per class
    and retry; the call succeeds once the fault clears."""
    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("ECONNREFUSED storage endpoint")
        return "ok"

    assert api.run_with_retry(flaky, retries=3, sleeper=sleeps.append) == "ok"
    assert calls["n"] == 3
    assert sleeps == [2.0, 4.0]  # connection class: 2s * attempt


def test_run_with_retry_timeout_class_and_exhaustion(api):
    sleeps: list[float] = []

    def always_slow():
        raise RuntimeError("query timed out after 60000ms")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="timed out"):
        api.run_with_retry(always_slow, retries=3, sleeper=sleeps.append)
    assert sleeps == [1.0, 2.0]  # timeout class: 1s * attempt, no
    # sleep after the final attempt — it re-raises instead


def test_run_with_retry_nontransient_raises_immediately(api):
    sleeps: list[float] = []

    def broken():
        raise ValueError("syntax error in query")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        api.run_with_retry(broken, sleeper=sleeps.append)
    assert sleeps == []  # db.js: `else throw err` — no retry


def test_test_connection_health_walk(api):
    """test_connection.js health walk: empty engine reports no tables
    and no state; after the orchestrator records a height the report
    carries it with a fresh staleness age."""
    fresh = api.test_connection()
    assert fresh["tables"] == []
    assert fresh["last_processed_height"] is None
    assert fresh["state_age_s"] is None
    assert fresh["version"]  # engine version, like SELECT version()

    api.update_last_indexed_height("orchestrator", 4321)
    report = api.testClickHouseConnection()  # reference export alias
    assert "index_state" in report["tables"]
    assert report["last_processed_height"] == 4321
    assert report["state_age_s"] is not None and report["state_age_s"] < 300


def test_ch_sql_translates_reference_dialect():
    """Pure-text translation of the constructs the reference's SQL
    actually uses (clickhouse_queries.js:155,165,222;
    orchestrator.js:255,388)."""
    t = IndexerAPI.ch_sql
    assert t("SELECT count() as count FROM work_queue FINAL "
             "WHERE status = 'pending'") == (
        "SELECT count(*) as count FROM work_queue  WHERE status = 'pending'"
    )
    assert t("SELECT COALESCE(MAX(height), CAST(0 AS UInt64)) AS max_h "
             "FROM blocks") == (
        "SELECT COALESCE(MAX(height), CAST(0 AS BIGINT)) AS max_h FROM blocks"
    )
    assert t("SELECT intDiv(height, 100000) AS p, argMax(h, ts), "
             "uniqExact(u), uniq(v), toStartOfDay(ts), toDate(ts), "
             "toUInt32(x), NOW()") == (
        "SELECT (height div 100000) AS p, max_by(h, ts), "
        "count(DISTINCT u), approx_count_distinct(v), "
        "date_trunc('DAY', ts), CAST(ts AS DATE), "
        "CAST(x AS BIGINT), current_timestamp()"
    )


def test_ch_query_runs_reference_strings_verbatim(api):
    """The reference's literal query texts execute unchanged through
    ch_query over the FINAL views."""
    api.insert_work_queue([
        {"id": 1, "start_height": 1, "end_height": 10},
        {"id": 2, "start_height": 11, "end_height": 20},
        {"id": 3, "start_height": 21, "end_height": 30},
    ])
    api.update_work_queue_status(2, "processing")

    # clickhouse_queries.js:155
    r = api.ch_query(
        "SELECT count() as count FROM work_queue FINAL "
        "WHERE status = 'pending'"
    ).collect()
    assert r[0]["count"] == 2
    # clickhouse_queries.js:165
    rows = api.ch_query(
        "SELECT * FROM work_queue FINAL WHERE status = 'pending' "
        "ORDER BY id LIMIT 1"
    ).collect()
    assert [x["id"] for x in rows] == [1]
    # orchestrator.js:255
    r = api.ch_query(
        "SELECT COUNT(*) as count FROM work_queue FINAL "
        "WHERE status IN ('pending', 'processing')"
    ).collect()
    assert r[0]["count"] == 3
