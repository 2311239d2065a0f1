"""Time-series analogs (timeseries.py #165-167): parallel-LTTB bucket
invariants + endpoint anchoring, deltaSum counter semantics, and the
truncated integer EMA — each checked against an independent Python
recompute over the raw events."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.operators.timeseries import (
    EMA_W,
    LTTB_B,
    delta_sum_counter,
    ema_time_decay,
    lttb_downsample,
)


def _raw_events(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
        )
        .collect()
    )


def test_lttb_one_point_per_bucket_and_endpoints(spark, sf_dir):
    raw = _raw_events(spark, sf_dir)
    xmin = min(r.x for r in raw)
    span = max(max(r.x for r in raw) - xmin, 1)

    def bucket(x):
        return min((x - xmin) * LTTB_B // span, LTTB_B - 1)

    nonempty = {bucket(r.x) for r in raw}
    out = lttb_downsample(spark, sf_dir).collect()
    assert {r.bucket for r in out} == nonempty
    assert len(out) == len(nonempty)  # exactly one pick per bucket

    by_bucket = {r.bucket: r for r in out}
    # endpoint anchoring: first/last existing buckets pick the
    # earliest/latest point of the series
    first_pt = min(raw, key=lambda r: (r.x, r.event_id))
    last_pt = max(raw, key=lambda r: (r.x, -r.event_id))
    assert by_bucket[min(nonempty)].event_id == first_pt.event_id
    assert by_bucket[max(nonempty)].event_id == last_pt.event_id
    # every pick really lives in its bucket and carries its own cents
    y_by_id = {r.event_id: (r.y, bucket(r.x)) for r in raw}
    for r in out:
        y, b = y_by_id[r.event_id]
        assert (r.value_c, r.bucket) == (y, b)


def test_lttb_middle_picks_maximize_triangle_area(spark, sf_dir):
    raw = _raw_events(spark, sf_dir)
    xmin = min(r.x for r in raw)
    span = max(max(r.x for r in raw) - xmin, 1)
    pts = defaultdict(list)
    for r in raw:
        b = min((r.x - xmin) * LTTB_B // span, LTTB_B - 1)
        pts[b].append((r.x - xmin, r.y, r.event_id))
    stats = {
        b: (sum(p[0] for p in v) // len(v), sum(p[1] for p in v) // len(v))
        for b, v in pts.items()
    }
    order = sorted(pts)
    out = {r.bucket: r.event_id for r in lttb_downsample(spark, sf_dir).collect()}
    for i, b in enumerate(order):
        if i == 0 or i == len(order) - 1:
            continue
        axp, ayp = stats[order[i - 1]]
        axn, ayn = stats[order[i + 1]]

        def area(p):
            rx, y, _ = p
            return abs((axp - axn) * (y - ayp) - (axp - rx) * (ayn - ayp))

        best = max(area(p) for p in pts[b])
        picked = next(p for p in pts[b] if p[2] == out[b])
        assert area(picked) == best


def test_delta_sum_counter_matches_recompute(spark, sf_dir):
    raw = _raw_events(spark, sf_dir)
    series = defaultdict(list)
    for r in raw:
        series[r.user_id].append((r.ts, r.event_id, r.y))
    expected = {}
    for u, v in series.items():
        v.sort()
        ds = sum(
            b[2] - a[2] for a, b in zip(v, v[1:]) if b[2] > a[2]
        )
        resets = sum(1 for a, b in zip(v, v[1:]) if b[2] < a[2])
        expected[u] = (ds, resets, len(v))
    rows = delta_sum_counter(spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert (r.delta_sum, r.n_resets, r.n_events) == expected[r.user_id]


def test_ema_time_decay_matches_recompute(spark, sf_dir):
    raw = _raw_events(spark, sf_dir)
    per_day = defaultdict(lambda: [0, 0])
    for r in raw:
        key = (r.event_type, r.ts.date())
        per_day[key][0] += r.y
        per_day[key][1] += 1
    mean_m = {k: (s * 1000) // c for k, (s, c) in per_day.items()}
    by_type = defaultdict(dict)
    for (t, d), m in mean_m.items():
        by_type[t][d.toordinal()] = m
    rows = ema_time_decay(spark, sf_dir).collect()
    assert len(rows) == len(mean_m)
    for r in rows:
        days = by_type[r.event_type]
        tgt = r.day.toordinal()
        num = den = n = 0
        for lag in range(EMA_W + 1):
            src = tgt - lag
            if src in days:
                w = 1 << (EMA_W - lag)
                num += days[src] * w
                den += w
                n += 1
        assert (r.ema_m, r.n_src) == (num // den, n)
        # the EMA of integer day-means stays inside their envelope
        window_means = [
            days[tgt - lag] for lag in range(EMA_W + 1) if tgt - lag in days
        ]
        assert min(window_means) <= r.ema_m <= max(window_means)


def test_quantile_exact_weighted_matches_recompute(spark, sf_dir):
    from zigchain_indexer_clickhouse_spark.operators.ch_aggregates import (
        quantile_exact_weighted,
    )

    raw = _raw_events(spark, sf_dir)
    per = {}
    for r in raw:
        per.setdefault(r.event_type, []).append((r.y, 1 + r.event_id % 5))
    rows = quantile_exact_weighted(spark, sf_dir).collect()
    assert len(rows) == len(per)
    for r in rows:
        vals = sorted(per[r.event_type])
        tot = sum(w for _, w in vals)
        assert r.total_w == tot

        def pick(num, den):
            cum = 0
            for v, w in vals:
                cum += w
                if cum * den >= tot * num:
                    return v
            raise AssertionError("quantile fell off the end")

        assert r.p50_c == pick(1, 2)
        assert r.p90_c == pick(9, 10)


def test_stream_heavy_hitters_exact_two_pass(spark, sf_dir):
    """The streamed MG candidate pass + exact recount must equal a
    brute-force batch recount — the sketch bounds state, never the
    answer (superset guarantee per user-hash stripe)."""
    from collections import Counter

    from zigchain_indexer_clickhouse_spark.streaming.event_stream import (
        SH_K,
        stream_heavy_hitters,
    )

    raw = _raw_events(spark, sf_dir)
    true = Counter(r.user_id for r in raw)
    n = len(raw)
    expected = {u: c for u, c in true.items() if c * SH_K > n}
    rows = {r.user_id: (r.cnt, r.share_ppm)
            for r in stream_heavy_hitters(spark, sf_dir).collect()}
    assert set(rows) == set(expected)
    for u, (cnt, ppm) in rows.items():
        assert cnt == expected[u]
        assert ppm == cnt * 1_000_000 // n


def test_mad_outlier_bounds_matches_recompute(spark, sf_dir):
    from zigchain_indexer_clickhouse_spark.operators.timeseries import (
        mad_outlier_bounds,
    )

    raw = _raw_events(spark, sf_dir)
    per = defaultdict(list)
    for r in raw:
        per[r.event_type].append(r.y)

    def med(vals):
        v = sorted(vals)
        tot = len(v)
        cum = 0
        # smallest value whose cumulative count reaches half (the
        # weighted-quantile tie rule both engines implement)
        from itertools import groupby

        for val, grp in groupby(v):
            cum += sum(1 for _ in grp)
            if cum * 2 >= tot:
                return val
        raise AssertionError

    rows = {r.event_type: r for r in mad_outlier_bounds(spark, sf_dir).collect()}
    assert rows.keys() == per.keys()
    for t, vals in per.items():
        m = med(vals)
        mad = med([abs(y - m) for y in vals])
        r = rows[t]
        assert (r.med_c, r.mad_c) == (m, mad)
        assert (r.lo_c, r.hi_c) == (m - 5 * mad, m + 5 * mad)
        assert r.n_outliers == sum(
            1 for y in vals if y < r.lo_c or y > r.hi_c
        )


def test_time_weighted_avg_matches_recompute(spark, sf_dir):
    from zigchain_indexer_clickhouse_spark.operators.timeseries import (
        time_weighted_avg,
    )

    raw = _raw_events(spark, sf_dir)
    per = defaultdict(list)
    for r in raw:
        per[r.user_id].append((r.x, r.event_id, r.y))
    rows = {r.user_id: r for r in time_weighted_avg(spark, sf_dir).collect()}
    for u, v in per.items():
        v.sort()
        holds = [
            (b[0] - a[0], a[2]) for a, b in zip(v, v[1:])
        ]
        if not holds:
            assert u not in rows
            continue
        num = sum(y * d for d, y in holds)
        den = sum(d for d, _ in holds)
        r = rows[u]
        assert (r.twa_c, r.span_us, r.n_holds) == (num // den, den, len(holds))
        # a time-weighted mean of cents stays inside the value envelope
        ys = [y for _, y in holds]
        assert min(ys) <= r.twa_c <= max(ys)
