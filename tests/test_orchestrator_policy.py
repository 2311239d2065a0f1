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
    SEED_CHUNK,
    _admit_gap_ranges,
    _missing_islands,
    _subtract_ranges,
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


# --- seedWorkQueue subtraction edge states (orchestrator.js:574-636) -------


def _chunks_df(spark, hi):
    rows = []
    c = 0
    while 1 + c * SEED_CHUNK <= hi:
        rows.append((c, 1 + c * SEED_CHUNK, min((c + 1) * SEED_CHUNK, hi)))
        c += 1
    return spark.createDataFrame(rows, "chunk_id: long, cs: long, ce: long")


def _brute_subtract(hi, ranges):
    covered = set()
    for s, e in ranges:
        covered.update(range(s, e + 1))
    out = []
    c = 0
    while 1 + c * SEED_CHUNK <= hi:
        cs, ce = 1 + c * SEED_CHUNK, min((c + 1) * SEED_CHUNK, hi)
        seg = None
        for h in range(cs, ce + 1):
            if h not in covered and seg is None:
                seg = h
            elif h in covered and seg is not None:
                out.append((c, seg, h - 1))
                seg = None
        if seg is not None:
            out.append((c, seg, ce))
        c += 1
    return sorted(out)


def test_subtract_range_beyond_tip_keeps_clamped_chunk(spark):
    """A pending range whose nominal chunk arithmetic lands on the
    tip-clamped LAST chunk but whose span starts beyond the tip must
    not mark that chunk as touched — the whole clamped chunk is still
    unseeded and must be emitted (regression: the untouched anti-join
    probed pre-clip candidates and swallowed it)."""
    hi = 1234  # chunks [1,500] [501,1000] [1001,1234 (clamped from 1500)]
    got = sorted(
        (r.chunk_id, r.start_height, r.end_height)
        for r in _subtract_ranges(
            _chunks_df(spark, hi),
            spark.createDataFrame(
                [(1300, 1310)], "start_height: long, end_height: long"
            ),
        ).collect()
    )
    assert got == [(0, 1, 500), (1, 501, 1000), (2, 1001, 1234)]


def test_subtract_ranges_matches_brute_force(spark):
    cases = [
        [],  # nothing queued -> every chunk whole
        [(1, 1234)],  # everything covered -> empty
        [(250, 750)],  # one range across a chunk boundary
        [(1, 100), (200, 300), (450, 520), (999, 1101), (1200, 1234)],
        [(100, 200), (150, 250)],  # overlapping existing ranges
        [(500, 501), (1000, 1001)],  # boundary-adjacent pairs
        [(1230, 1500)],  # tail range overhanging the tip
    ]
    hi = 1234
    for ranges in cases:
        got = sorted(
            (r.chunk_id, r.start_height, r.end_height)
            for r in _subtract_ranges(
                _chunks_df(spark, hi),
                spark.createDataFrame(
                    [(s, e) for s, e in ranges],
                    "start_height: long, end_height: long",
                ),
            ).collect()
        )
        assert got == _brute_subtract(hi, ranges), f"ranges={ranges}"


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
    # surviving pending count must EXACTLY equal the post-requeue
    # pending rows whose range end clears the window floor (an exact
    # count, so a silently disabled drop filter fails this — the
    # below-window tail would survive and inflate it)
    max_end = n(
        f"SELECT MAX(o_orderkey*5 + 4 + (o_custkey%10)) FROM {orders}"
    )
    min_allowed = max_end - max_end // 2
    expected_pending = n(
        f"""SELECT COUNT(*) FROM {orders}
        WHERE (o_orderstatus = 'O'
               OR (o_orderstatus = 'F'
                   AND o_orderdate < DATE '{FAILED_CUTOFF}'))
          AND o_orderkey*5 + 4 + (o_custkey%10) >= {min_allowed}"""
    )
    dropped = n(
        f"""SELECT COUNT(*) FROM {orders}
        WHERE (o_orderstatus = 'O'
               OR (o_orderstatus = 'F'
                   AND o_orderdate < DATE '{FAILED_CUTOFF}'))
          AND o_orderkey*5 + 4 + (o_custkey%10) < {min_allowed}"""
    )
    assert dropped > 0, "sf data must exercise the drop branch"
    assert out["O"].n_items == expected_pending
    assert out["O"].min_start >= 0
    con.close()
