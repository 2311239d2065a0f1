"""Semantic checks for the statistical-test family (#208-213): each
statistic is re-derived with a brute-force plain-Python implementation
from the same parquet rows, so a rank-handling or windowing bug can't
hide behind the (independently-formulated but structurally similar)
DuckDB oracle."""

from __future__ import annotations

from collections import defaultdict

from zigchain_indexer_clickhouse_spark.operators.statistics import (
    interval_length_sum,
    ks_test_pairs,
    mann_whitney_u_pairs,
    roc_auc_doc_length,
    simple_linear_regression,
    spearman_rank_corr,
)


def _events(spark, sf_dir):
    return [
        (r.event_type, int(round(r.value * 100)), r.user_id, r.ts)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    ]


def _doubled_ranks(values):
    """value -> doubled tie-averaged rank (2a + c - 1)."""
    s = sorted(values)
    first, cnt = {}, defaultdict(int)
    for i, v in enumerate(s):
        first.setdefault(v, i + 1)
        cnt[v] += 1
    return {v: 2 * first[v] + cnt[v] - 1 for v in cnt}


def test_mann_whitney_brute_force(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = {
        (r.type_a, r.type_b): r
        for r in mann_whitney_u_pairs(spark, sf_dir).collect()
    }
    types = sorted({t for t, *_ in ev})
    assert len(got) == len(types) * (len(types) - 1) // 2
    for ta, tb in list(got)[:4]:
        xs = [c for t, c, *_ in ev if t == ta]
        ys = [c for t, c, *_ in ev if t == tb]
        rk = _doubled_ranks(xs + ys)
        r2a = sum(rk[v] for v in xs)
        u2 = r2a - len(xs) * (len(xs) + 1)
        row = got[(ta, tb)]
        assert (row.n_a, row.n_b) == (len(xs), len(ys))
        assert row.u2_a == u2
        assert row.cles_ppm == u2 * 1_000_000 // (2 * len(xs) * len(ys))
        assert 0 <= row.u2_a <= 2 * len(xs) * len(ys)


def test_ks_brute_force(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = {
        (r.type_a, r.type_b): r for r in ks_test_pairs(spark, sf_dir).collect()
    }
    for ta, tb in list(got)[:3]:
        xs = sorted(c for t, c, *_ in ev if t == ta)
        ys = sorted(c for t, c, *_ in ev if t == tb)
        pts = sorted(set(xs) | set(ys))
        na, nb = len(xs), len(ys)
        d = 0
        ca = cb = 0
        ia = ib = 0
        for p in pts:
            while ia < na and xs[ia] <= p:
                ia += 1
            while ib < nb and ys[ib] <= p:
                ib += 1
            d = max(d, abs(ia * nb - ib * na))
        row = got[(ta, tb)]
        assert (row.n_a, row.n_b, row.d_num) == (na, nb, d)
        assert row.d_milli == d * 1000 // (na * nb)


def test_spearman_brute_force(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = {r.event_type: r for r in spearman_rank_corr(spark, sf_dir).collect()}
    per_user = defaultdict(lambda: [0, 0])
    for t, c, u, _ in ev:
        per_user[(t, u)][0] += 1
        per_user[(t, u)][1] += c
    for t in list(got)[:2]:
        xs = [v[0] for (tt, _), v in per_user.items() if tt == t]
        ys = [v[1] for (tt, _), v in per_user.items() if tt == t]
        # same (type,user) iteration order for both lists
        rx = _doubled_ranks(xs)
        ry = _doubled_ranks(ys)
        rxv = [rx[v] for v in xs]
        ryv = [ry[v] for v in ys]
        m = len(xs)
        sx, sy = sum(rxv), sum(ryv)
        sxy = sum(a * b for a, b in zip(rxv, ryv))
        sxx = sum(a * a for a in rxv)
        syy = sum(b * b for b in ryv)
        rho = (float(m) * sxy - float(sx) * sy) / (
            (float(m) * sxx - float(sx) * sx) ** 0.5
            * (float(m) * syy - float(sy) * sy) ** 0.5
        )
        row = got[t]
        assert row.n_users == m
        # brute float path may differ by an ulp around the floor edge
        assert abs(row.rho_ppm - rho * 1_000_000) <= 2
        assert -1_000_000 <= row.rho_ppm <= 1_000_000


def test_slr_brute_force(spark, sf_dir):
    ev = [
        (r.event_type, r.ts.hour, int(round(r.value * 100)))
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    ]
    got = {
        r.event_type: r for r in simple_linear_regression(spark, sf_dir).collect()
    }
    for t in got:
        pts = [(x, y) for tt, x, y in ev if tt == t]
        m = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        k = (float(m) * sxy - float(sx) * sy) / (float(m) * sxx - float(sx) * sx)
        b = (float(sy) - k * sx) / m
        row = got[t]
        assert row.n_events == m
        assert abs(row.slope_micro - k * 1_000_000) <= 2
        assert abs(row.intercept_milli - b * 1000) <= 2
        assert 0 <= row.r2_ppm <= 1_000_000


def test_auc_brute_force(spark, sf_dir):
    docs = [
        (r.lang, int(r.n_chars))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    got = {r.lang: r for r in roc_auc_doc_length(spark, sf_dir).collect()}
    langs = {l for l, _ in docs}
    assert set(got) == langs
    rk = _doubled_ranks([c for _, c in docs])
    n = len(docs)
    for lang in list(langs)[:3]:
        pos = [c for l, c in docs if l == lang]
        npos, nneg = len(pos), n - len(pos)
        r2 = sum(rk[c] for c in pos)
        auc = (r2 - npos * (npos + 1)) * 1_000_000 // (2 * npos * nneg)
        row = got[lang]
        assert (row.n_pos, row.n_neg, row.auc_ppm) == (npos, nneg, auc)
        assert 0 <= row.auc_ppm <= 1_000_000


def test_interval_union_brute_force(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = {r.day: r for r in interval_length_sum(spark, sf_dir).collect()}
    per_key = defaultdict(list)
    for t, c, u, ts in ev:
        s = int(ts.timestamp() * 1_000_000)
        per_key[(u, ts.date())].append((s, s + (c % 300 + 1) * 1_000_000))
    day_cov = defaultdict(int)
    day_users = defaultdict(int)
    day_iv = defaultdict(int)
    day_max = defaultdict(int)
    for (u, day), ivs in per_key.items():
        ivs.sort()
        cov, hi = 0, None
        for s, e in ivs:
            if hi is None or s > hi:
                cov += e - s
                hi = e
            elif e > hi:
                cov += e - hi
                hi = e
        day_cov[day] += cov
        day_users[day] += 1
        day_iv[day] += len(ivs)
        day_max[day] = max(day_max[day], cov)
    assert set(got) == set(day_cov)
    for day, row in got.items():
        assert row.n_users == day_users[day]
        assert row.n_intervals == day_iv[day]
        assert row.covered_us == day_cov[day]
        assert row.max_user_covered_us == day_max[day]


def test_skew_kurtosis_brute_force(spark, sf_dir):
    from zigchain_indexer_clickhouse_spark.operators.statistics import (
        skew_kurtosis_by_type,
    )

    import math

    # Spark/DuckDB round() is half-away-from-zero; Python round() is
    # banker's — mimic the engines (values are positive)
    ev = [
        (r.event_type, math.floor(r.value + 0.5))
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    ]
    got = {r.event_type: r for r in skew_kurtosis_by_type(spark, sf_dir).collect()}
    for t in got:
        xs = [x for tt, x in ev if tt == t]
        m = len(xs)
        mean = sum(xs) / m
        m2 = sum((x - mean) ** 2 for x in xs) / m
        m3 = sum((x - mean) ** 3 for x in xs) / m
        m4 = sum((x - mean) ** 4 for x in xs) / m
        row = got[t]
        assert row.n_events == m
        assert abs(row.skew_micro - (m3 / m2**1.5) * 1e6) <= 3
        assert abs(row.kurt_micro - (m4 / m2**2) * 1e6) <= 3
