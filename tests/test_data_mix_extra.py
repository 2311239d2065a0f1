"""Semantic checks for the round-6 data-mix additions: temperature
smoothing must genuinely flatten the language distribution (#220), and
the capped distinct must agree with the uncapped truth below the cap
(#221)."""

from __future__ import annotations

from collections import defaultdict

from zigchain_indexer_clickhouse_spark.operators.data_mix import (
    _TEMP_BUDGET,
    _UNIQ_CAP,
    domain_temperature_mix,
    uniq_up_to_daily,
)


def test_temperature_mix_flattens(spark, sf_dir):
    rows = domain_temperature_mix(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    assert total == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    hi = max(rows, key=lambda r: r.n_docs)
    lo = min(rows, key=lambda r: r.n_docs)
    # α=0.5 smoothing pulls every share toward uniform: the dominant
    # language is down-weighted, the rarest up-weighted
    if hi.n_docs > lo.n_docs:
        assert hi.smoothed_share_ppm <= hi.raw_share_ppm
        assert lo.smoothed_share_ppm >= lo.raw_share_ppm
    # quotas exhaust the budget up to floor loss (≤1 doc per language)
    assert _TEMP_BUDGET - len(rows) <= sum(
        r.target_docs for r in rows
    ) <= _TEMP_BUDGET
    # shares are a probability vector up to floor loss
    s = sum(r.smoothed_share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000


def test_uniq_up_to_matches_truth(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    truth = defaultdict(set)
    for r in ev:
        truth[(r.event_type, r.ts.date())].add(r.user_id)
    got = {
        (r.event_type, r.day): r for r in uniq_up_to_daily(spark, sf_dir).collect()
    }
    assert set(got) == set(truth)
    for k, users in truth.items():
        row = got[k]
        n = len(users)
        if n <= _UNIQ_CAP:
            assert (row.uniq_up_to, row.saturated) == (n, 0)
        else:
            assert (row.uniq_up_to, row.saturated) == (_UNIQ_CAP + 1, 1)
