"""Checks for the decode-derived analytics ops (#214-215) and the
decontamination transform (#216): each is cross-checked against an
independent recompute from the raw tables, and #216 against the #64
audit it must agree with."""

from __future__ import annotations

from collections import defaultdict

from zigchain_indexer_clickhouse_spark.operators.curation import (
    contamination_check,
    decontaminate_transform,
)
from zigchain_indexer_clickhouse_spark.sources.tx_decode import (
    contract_call_activity,
    token_flow_graph,
)


def test_token_flow_graph_matches_synthesis(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    flows = defaultdict(lambda: [0, 0])
    for r in ev:
        k = (f"zig1u{r.user_id}", f"zig1c{r.user_id + r.event_id % 5}")
        flows[k][0] += 1
        flows[k][1] += int(r.value * 100)  # floor of positive value
    top = sorted(flows.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    got = token_flow_graph(spark, sf_dir).collect()
    assert len(got) == 20
    # returned in descending total order with deterministic tie-break
    totals = [r.total_uzig for r in got]
    assert totals == sorted(totals, reverse=True)
    assert [
        ((r.from_addr, r.to_addr), [r.n_sends, r.total_uzig]) for r in got
    ] == [(k, v) for k, v in top]


def test_contract_call_activity_conserves_mass(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    got = {r.contract: r for r in contract_call_activity(spark, sf_dir).collect()}
    assert set(got) == {f"zig1w{i}" for i in range(7)}
    assert sum(r.n_calls for r in got.values()) == len(ev)
    assert sum(r.total_transferred for r in got.values()) == sum(
        int(r.value * 100) for r in ev
    )
    per_c = defaultdict(set)
    for r in ev:
        per_c[f"zig1w{r.event_id % 7}"].add(r.user_id)
    for c, row in got.items():
        assert row.n_senders == len(per_c[c])


def test_decontaminate_agrees_with_audit(spark, sf_dir):
    flagged = {
        r.doc_id
        for r in contamination_check(spark, sf_dir).collect()
        if r.doc_id % 50 != 0  # benchmark docs are exempt from removal
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    got = {r.source: r for r in decontaminate_transform(spark, sf_dir).collect()}
    per_src = defaultdict(lambda: [0, 0, 0])  # total, removed, kept_chars
    for d in docs:
        per_src[d.source][0] += 1
        if d.doc_id in flagged:
            per_src[d.source][1] += 1
        else:
            per_src[d.source][2] += d.n_chars
    assert set(got) == set(per_src)
    for src, (tot, rem, chars) in per_src.items():
        row = got[src]
        assert (row.n_docs, row.n_removed, row.n_kept, row.kept_chars) == (
            tot,
            rem,
            tot - rem,
            chars,
        )
