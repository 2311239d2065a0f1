"""Checks for the chain-health ops (#217-218) and the LSH band-tuning
sweep (#219): brute-force recomputes plus the cross-config nesting and
cross-operator consistency the sweep must satisfy."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from zigchain_indexer_clickhouse_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_band_tuning,
    shared_hashed_shingles,
)
from zigchain_indexer_clickhouse_spark.operators.queue_analytics import (
    block_time_drift,
    reorg_candidates,
)


def test_block_time_drift_brute_force(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_day = defaultdict(list)
    for r in ev:
        per_day[r.ts.date()].append((r.event_id, int(r.ts.timestamp() * 1e6)))
    got = {r.day: r for r in block_time_drift(spark, sf_dir).collect()}
    assert set(got) == {d for d, v in per_day.items() if len(v) > 1}
    for day, rows in per_day.items():
        if len(rows) < 2:
            continue
        rows.sort()
        gaps = [b[1] - a[1] for a, b in zip(rows, rows[1:])]
        row = got[day]
        assert row.n_blocks == len(rows)
        assert row.min_gap_us == min(gaps)
        assert row.max_gap_us == max(gaps)
        assert row.n_gaps_over_10s == sum(g > 10_000_000 for g in gaps)
        import math

        assert row.mean_gap_us == math.floor(sum(gaps) / len(gaps))


def test_reorg_candidates_brute_force(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    heights = defaultdict(list)
    for r in ev:
        h = r.event_id // 2
        forked = r.event_id % 2 == 1 and r.user_id % 10 == 0
        hh = hashlib.sha256(
            (str(h) + ("fork" if forked else "")).encode()
        ).hexdigest()
        heights[h].append((r.event_id % 2, hh))
    expect = {
        h: rows for h, rows in heights.items() if len({x[1] for x in rows}) > 1
    }
    got = {r.height: r for r in reorg_candidates(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for h, rows in expect.items():
        row = got[h]
        assert row.n_rows == len(rows)
        assert row.n_variants == len({x[1] for x in rows})
        assert row.canonical_hash == max(rows)[1]  # max version wins


def test_band_tuning_nesting_and_consistency(spark, sf_dir):
    got = {r.config: r for r in minhash_band_tuning(spark, sf_dir).collect()}
    assert set(got) == {"b8r1", "b4r2", "b2r4", "b1r8"}
    # embedded S-curve midpoints are the exact shared literals
    assert got["b8r1"].threshold_ppm == 125_000
    assert got["b4r2"].threshold_ppm == 500_000
    assert got["b1r8"].threshold_ppm == 1_000_000
    # nesting: a pair colliding on a coarser (more-rows) band collides
    # on every finer split of it — so candidate volume is monotone in
    # the number of bands (exact when no mega-bucket was dropped on
    # either side of a comparison)
    order = ["b1r8", "b2r4", "b4r2", "b8r1"]
    for lo, hi in zip(order, order[1:]):
        if got[lo].n_dropped_buckets == 0 and got[hi].n_dropped_buckets == 0:
            assert got[lo].n_candidate_pairs <= got[hi].n_candidate_pairs
    # the b4r2 config IS the production #34 banding: with no drops its
    # candidate count must equal the shared lsh_candidate_pairs stage
    if got["b4r2"].n_dropped_buckets == 0:
        n34 = lsh_candidate_pairs(
            shared_hashed_shingles(spark, sf_dir)
        ).count()
        assert got["b4r2"].n_candidate_pairs == n34
