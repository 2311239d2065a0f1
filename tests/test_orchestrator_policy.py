"""Branch coverage for the round-5 orchestrator policy operators
(#153 gap_backfill_window, #154 queue_cleanup, #155 orchestrator_tick):
the oracle-parity test proves the data-driven path; these tests drive
the gate/decision helpers through every branch with injected scalars,
including the states the sf data never produces (full queue, drained
queue, reached target).

Reference: orchestrator.js:245-291 (detectAndFillGaps gates),
:296-345 (cleanupOldWorkQueue), :443-505 (mainLoop branches).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.operators.orchestration import (
    FAILED_CUTOFF,
    _admit_gap_ranges,
    _missing_islands,
    _tick_decision,
    gap_backfill_window,
    queue_cleanup,
)


def _one_row(spark, **cols):
    return spark.range(1).select(
        *[F.lit(v).cast("long").alias(k) for k, v in cols.items()]
    )


def _gaps_df(spark):
    return spark.createDataFrame(
        [(10, 20), (100, 150), (300, 400)],
        "start_height: long, end_height: long",
    )


# --- detectAndFillGaps admission gates (orchestrator.js:245-291) -----------


def test_gap_gate_closed_when_queue_near_full(spark):
    caps = _one_row(spark, total=100, queued=80)  # exactly 80% -> skip
    win = _one_row(spark, min_start=0)
    assert _admit_gap_ranges(_gaps_df(spark), caps, win).count() == 0


def test_gap_gate_open_under_capacity(spark):
    caps = _one_row(spark, total=100, queued=79)
    win = _one_row(spark, min_start=0)
    assert _admit_gap_ranges(_gaps_df(spark), caps, win).count() == 3


def test_gap_backfill_window_drops_old_ranges(spark):
    caps = _one_row(spark, total=100, queued=10)
    win = _one_row(spark, min_start=151)  # [100,150] ends just below
    rows = _admit_gap_ranges(_gaps_df(spark), caps, win).collect()
    assert [(r.start_height, r.end_height) for r in rows] == [(300, 400)]


def test_gap_ranges_disjoint_and_windowed(spark, sf_dir):
    rows = gap_backfill_window(spark, sf_dir).orderBy("start_height").collect()
    assert rows, "sf data must admit gap ranges (gate open by design)"
    for a, b in zip(rows, rows[1:]):
        assert a.end_height < b.start_height, "ranges must be disjoint"
    assert all(r.start_height <= r.end_height for r in rows)


def _brute_islands(present: set[int], hmax: int) -> list[tuple[int, int]]:
    out, s = [], None
    for h in range(hmax + 1):
        if h not in present and s is None:
            s = h
        elif h in present and s is not None:
            out.append((s, h - 1))
            s = None
    if s is not None:
        out.append((s, hmax))
    return out


def test_missing_islands_across_stripe_boundaries(spark):
    """The stripe-stitch path (a gap spanning one or more stripe
    boundaries closes against the NEXT non-empty stripe's first
    height) never fires at sf scale — one 65536-stripe holds the whole
    key domain — so force stripe=8 over adversarial present sets:
    gaps inside a stripe, across one boundary, across several empty
    stripes, at 0, and at the tail."""
    cases = [
        set(),  # everything missing -> one [0, hmax] island
        {0},  # leading present, all-tail gap
        {5, 6, 7, 8, 9},  # island straddles the 7|8 stripe boundary
        {0, 31},  # gap spans three interior stripes
        {7, 8},  # adjacent pair exactly at a boundary
        {0, 1, 2, 15, 16, 30, 31},  # mixed
        set(range(32)),  # nothing missing
        {3, 11, 19, 27},  # one present per stripe
    ]
    hmax = 31
    for present in cases:
        pres = spark.createDataFrame(
            [(h,) for h in sorted(present)], "h: long"
        )
        bounds = spark.range(1).select(F.lit(hmax).cast("long").alias("hmax"))
        got = sorted(
            (r.start_height, r.end_height)
            for r in _missing_islands(pres, bounds, stripe=8).collect()
        )
        assert got == _brute_islands(present, hmax), f"present={present}"


# --- mainLoop branch resolution (orchestrator.js:443-505) ------------------

_TICK_DEFAULTS = dict(
    pending=10, processing=5, capacity_threshold=100,
    last_indexed=1000, sync_target=3000, max_block=1000, total=15,
)


def _tick(spark, **over):
    return _tick_decision(_one_row(spark, **{**_TICK_DEFAULTS, **over}))


def test_tick_seed_window(spark):
    row = _tick(spark).collect()[0]
    assert row.decision == "seed"
    assert row.seed_start == 1001
    # ASSIGN_RANGE*NUM_WORKERS = 5000 overshoots the 3000 target -> clamp
    assert row.seed_end == 3000


def test_tick_finalize_when_target_reached(spark):
    row = _tick(spark, total=0, pending=0, processing=0,
                max_block=3000).collect()[0]
    assert row.decision == "finalize"
    assert row.seed_start is None and row.seed_end is None


def test_tick_reconcile_on_lingering_processing(spark):
    # total and processing come from two racing queue reads in the
    # reference (orchestrator.js:452-457 Promise.all over FINAL reads),
    # so total==0 with processing>0 is a reachable observed state.
    row = _tick(spark, total=0, pending=0, processing=3,
                max_block=1000).collect()[0]
    assert row.decision == "reconcile"


def test_tick_idle_when_queue_full(spark):
    row = _tick(spark, total=200).collect()[0]
    assert row.decision == "idle"
    assert row.seed_start is None


def test_tick_idle_when_synced(spark):
    row = _tick(spark, last_indexed=3000).collect()[0]
    assert row.decision == "idle"


# --- cleanupOldWorkQueue transitions (orchestrator.js:296-345) -------------


def test_queue_cleanup_requeues_and_drops(spark, sf_dir):
    import duckdb

    out = {r.status: r for r in queue_cleanup(spark, sf_dir).collect()}
    con = duckdb.connect()
    n = lambda q: con.execute(q).fetchone()[0]  # noqa: E731
    orders = f"read_parquet('{sf_dir}/orders.parquet')"
    fresh_failed = n(
        f"SELECT COUNT(*) FROM {orders} WHERE o_orderstatus='F'"
        f" AND o_orderdate >= DATE '{FAILED_CUTOFF}'"
    )
    # every failed row older than the cutoff was re-queued as pending
    assert out["F"].n_items == fresh_failed
    # processing untouched
    assert out["P"].n_items == n(
        f"SELECT COUNT(*) FROM {orders} WHERE o_orderstatus='P'"
    )
    # over-capacity drop removed the below-window pending tail: the
    # surviving pending set starts at/above the window floor
    max_end = n(
        f"SELECT MAX(o_orderkey*5 + 4 + (o_custkey%10)) FROM {orders}"
    )
    min_allowed = max_end - max_end // 2
    assert out["O"].max_end >= min_allowed
    con.close()
