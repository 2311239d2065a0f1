"""Strict-order funnel (#177) and tolerance as-of (#176): Python
recompute plus the cross-mode dominance property (strict can never
out-level the interleave-tolerant base funnel)."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.operators.funnel import (
    window_funnel,
    window_funnel_strict,
)
from zigchain_indexer_clickhouse_spark.operators.olap_extra import (
    ASOF_TOL_MIN,
    asof_join_tolerance,
)

_FUNNEL = ("signup", "click", "purchase")


def test_strict_funnel_matches_recompute_and_never_exceeds_base(spark, sf_dir):
    raw = (
        load(spark, sf_dir, "events")
        .filter("event_type IN ('signup','click','purchase')")
        .collect()
    )
    seq = defaultdict(list)
    for r in raw:
        seq[r.user_id].append((r.ts, r.event_id, r.event_type))
    expected = {}
    for u, v in seq.items():
        v.sort()
        anchor = next((i for i, x in enumerate(v) if x[2] == "signup"), None)
        if anchor is None:
            continue
        ts1 = v[anchor][0]
        end = ts1 + timedelta(days=7)
        lvl = 1
        if anchor + 1 < len(v) and v[anchor + 1][2] == "click" \
                and v[anchor + 1][0] <= end:
            lvl = 2
            if anchor + 2 < len(v) and v[anchor + 2][2] == "purchase" \
                    and v[anchor + 2][0] <= end:
                lvl = 3
        expected[u] = (ts1, lvl)

    rows = {r.user_id: (r.funnel_start, r.level)
            for r in window_funnel_strict(spark, sf_dir).collect()}
    assert rows == expected

    base = {r.user_id: r.level for r in window_funnel(spark, sf_dir).collect()}
    assert set(rows) == set(base)
    assert all(rows[u][1] <= base[u] for u in rows)
    # strict must actually bite somewhere or the mode adds nothing
    assert any(rows[u][1] < base[u] for u in rows)


def test_asof_tolerance_staleness_and_directions(spark, sf_dir):
    rows = asof_join_tolerance(spark, sf_dir).collect()
    assert rows
    tol = timedelta(minutes=ASOF_TOL_MIN)
    saw_stale_null = saw_fresh = 0
    for r in rows:
        if r.back_ts is not None:
            assert r.back_ts <= r.ts and r.ts - r.back_ts <= tol
            assert r.back_value is not None
            saw_fresh += 1
        else:
            saw_stale_null += 1
        if r.fwd_ts is not None:
            assert r.fwd_ts > r.ts  # strictly after, never self
    assert saw_fresh > 0 and saw_stale_null > 0


def test_sequence_count_equals_greedy_matcher(spark, sf_dir):
    """The bracket-matching closed form must equal a literal greedy
    left-to-right matcher over every user's event sequence."""
    from zigchain_indexer_clickhouse_spark.operators.funnel import (
        sequence_count,
    )

    raw = (
        load(spark, sf_dir, "events")
        .filter("event_type IN ('signup','click')")
        .collect()
    )
    seq = defaultdict(list)
    for r in raw:
        seq[r.user_id].append((r.ts, r.event_id, r.event_type))
    expected = {}
    for u, v in seq.items():
        v.sort()
        open_signups = matches = n_a = n_b = 0
        for _, _, t in v:
            if t == "signup":
                open_signups += 1
                n_a += 1
            else:
                n_b += 1
                if open_signups > 0:
                    open_signups -= 1
                    matches += 1
        expected[u] = (n_a, n_b, matches)
    rows = {r.user_id: (r.n_signups, r.n_clicks, r.n_matches)
            for r in sequence_count(spark, sf_dir).collect()}
    assert rows == expected
    # the matcher must actually skip some clicks somewhere (a click
    # with nothing open), or the closed form was never exercised
    assert any(b > m for _, b, m in expected.values())


@given(st.lists(st.sampled_from("ab"), min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_bracket_closed_form_property(pattern):
    """Property: matches == total_b - max(0, max_prefix(cum_b - cum_a))
    for EVERY a/b sequence, vs the greedy matcher."""
    open_a = matches = 0
    cum_a = cum_b = 0
    max_excess = 0
    for ch in pattern:
        if ch == "a":
            open_a += 1
            cum_a += 1
        else:
            cum_b += 1
            if open_a:
                open_a -= 1
                matches += 1
        max_excess = max(max_excess, cum_b - cum_a)
    assert matches == pattern.count("b") - max(0, max_excess)


def test_sequence_next_node_matches_python_recompute(spark, sf_dir):
    """Walk each user's (ts, event_id)-ordered stream in Python, take
    the event after the first signup, and compare bucket counts; shares
    must floor-sum to within len(buckets) ppm of a full million."""
    from zigchain_indexer_clickhouse_spark.operators.funnel import (
        sequence_next_node,
    )

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id, r.event_type))
    expected = defaultdict(int)
    for stream in per.values():
        stream.sort()
        for i, (_, _, et) in enumerate(stream):
            if et == "signup":
                expected[
                    stream[i + 1][2] if i + 1 < len(stream) else "(end)"
                ] += 1
                break
    rows = {r.next_node: r for r in sequence_next_node(spark, sf_dir).collect()}
    assert {k: r.n_users for k, r in rows.items()} == dict(expected)
    tot = sum(expected.values())
    assert all(
        r.share_ppm == r.n_users * 1_000_000 // tot for r in rows.values()
    )
    assert 1_000_000 - len(rows) < sum(r.share_ppm for r in rows.values()) <= 1_000_000
