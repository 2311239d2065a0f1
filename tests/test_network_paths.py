"""Checks for ip_subnet_rollup (#222) and path_analysis (#223):
brute-force recomputes from the raw events."""

from __future__ import annotations

from collections import defaultdict

from zigchain_indexer_clickhouse_spark.operators.ch_idioms import (
    ip_subnet_rollup,
)
from zigchain_indexer_clickhouse_spark.operators.funnel import path_analysis


def test_ip_rollup_brute_force(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_sub = defaultdict(lambda: [0, set(), 0, None, None])
    for r in ev:
        key = r.user_id * 40503 % 65536
        ip = (10 << 24) + (77 << 16) + key
        sub = ip // 256
        st = per_sub[sub]
        st[0] += 1
        st[1].add(ip)
        st[2] += int(round(r.value * 100))
        st[3] = ip if st[3] is None else min(st[3], ip)
        st[4] = ip if st[4] is None else max(st[4], ip)
    got = {r.subnet24: r for r in ip_subnet_rollup(spark, sf_dir).collect()}
    assert set(got) == set(per_sub)
    for sub, (n, ips, cents, lo, hi) in per_sub.items():
        row = got[sub]
        assert (row.n_events, row.n_ips, row.total_cents) == (n, len(ips), cents)
        assert (row.min_ip, row.max_ip) == (lo, hi)
        o1, o2, o3 = sub // 65536, (sub // 256) % 256, sub % 256
        assert row.cidr == f"{o1}.{o2}.{o3}.0/24"


def test_path_analysis_brute_force(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    counts = defaultdict(lambda: [0, set()])
    for u, rows in per_user.items():
        rows.sort()
        types = [t for _, _, t in rows]
        for a, b, c in zip(types, types[1:], types[2:]):
            p = f"{a}>{b}>{c}"
            counts[p][0] += 1
            counts[p][1].add(u)
    top = sorted(counts.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    got = path_analysis(spark, sf_dir).collect()
    assert [
        (r.path, r.n_occurrences, r.n_users) for r in got
    ] == [(p, n, len(us)) for p, (n, us) in top]
