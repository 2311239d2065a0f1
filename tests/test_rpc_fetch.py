"""The distributed RPC fetch layer (#149): transport seam, envelope
unwrap, and parse fidelity."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.sources.rpc_fetch import (
    fetch_block_results,
    rpc_fetch_ingest,
    synthetic_rpc_transport,
)


def test_synthetic_transport_serves_tendermint_envelope(sf_dir):
    t = synthetic_rpc_transport(sf_dir)
    body = json.loads(t("/block_results?height=0"))
    assert set(body) == {"result"}
    res = body["result"]
    assert res["height"] == 0
    assert res["txs_results"], "height 0 must carry txs"
    tx = res["txs_results"][0]
    assert set(tx) >= {"tx_index", "code", "gas_wanted", "gas_used", "events"}
    assert tx["events"][0]["attributes"][0]["key"] == "k"


def test_synthetic_transport_rejects_unknown_path(sf_dir):
    with pytest.raises(ValueError, match="unsupported RPC path"):
        synthetic_rpc_transport(sf_dir)("/genesis")


def test_synthetic_transport_serves_status_tip(sf_dir):
    """Tendermint /status → result.sync_info.latest_block_height, the
    one field the orchestrator reads (orchestrator.js:61)."""
    t = synthetic_rpc_transport(sf_dir)
    doc = json.loads(t("/status"))
    tip = int(doc["result"]["sync_info"]["latest_block_height"])
    assert tip > 0
    # the tip block must actually be servable
    body = json.loads(t(f"/block_results?height={tip}"))
    assert body["result"]["height"] == tip


def test_fetch_partitions_issue_their_own_requests(spark, sf_dir):
    """Every height lands exactly one JSON doc, fetched from whatever
    partition it hashed to — the sharded-pull shape."""
    heights = spark.range(5).select(F.col("id").alias("height")).repartition(3)
    raw = fetch_block_results(heights, synthetic_rpc_transport(sf_dir))
    docs = [json.loads(r["json"]) for r in raw.collect()]
    assert sorted(d["height"] for d in docs) == [0, 1, 2, 3, 4]
    # envelope already unwrapped (rpc.js res.data.result)
    assert all("result" not in d for d in docs)


def test_fetch_ingest_matches_direct_derivation(spark, sf_dir):
    """End-to-end: fetch → parse → per-height stats equals the direct
    events-table aggregation (the oracle's computation)."""
    got = {
        r["height"]: (r["n_txs"], r["n_failed"], r["total_gas_used"])
        for r in rpc_fetch_ingest(spark, sf_dir).collect()
    }
    from zigchain_indexer_clickhouse_spark.catalog import load

    want = {
        r["height"]: (r["n_txs"], r["n_failed"], r["total_gas_used"])
        for r in load(spark, sf_dir, "events")
        .groupBy(F.expr("event_id div 10").alias("height"))
        .agg(
            F.count("*").alias("n_txs"),
            F.sum(F.when(F.col("event_id") % 5 == 0, 1).otherwise(0)).alias(
                "n_failed"
            ),
            F.sum(F.floor(F.col("value") * 900).cast("long")).alias(
                "total_gas_used"
            ),
        )
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Failover transport (round 5): worker.js rotateRPC / rpcGet semantics
# ---------------------------------------------------------------------------
def _flaky(inner, fail_paths, name="ep"):
    """Deterministic failure injection: raise for paths in fail_paths,
    delegate otherwise; records every path it served."""
    served = []

    def t(path):
        if path in fail_paths:
            raise ConnectionError(f"{name} down for {path}")
        served.append(path)
        return inner(path)

    t.served = served
    return t


def test_failover_rotates_and_completes(spark, sf_dir):
    """Endpoint 0 fails for k heights; the fetch still completes with
    correct stats and the failures are counted per endpoint
    (worker.js:24 rotateRPC)."""
    from zigchain_indexer_clickhouse_spark.sources.rpc_fetch import (
        failover_transport,
        parse_block_results,
    )

    base = synthetic_rpc_transport(sf_dir)
    bad_paths = {f"/block_results?height={h}" for h in (1, 3)}
    ep0 = _flaky(base, bad_paths, "ep0")
    ep1 = _flaky(base, set(), "ep1")
    t = failover_transport([ep0, ep1])

    # single partition so the sticky per-process index is observable
    heights = spark.range(5).select(F.col("id").alias("height")).coalesce(1)
    raw = fetch_block_results(heights, t)
    flat = parse_block_results(raw)
    got = {
        r["height"]: r["n"]
        for r in flat.groupBy("height").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    assert all(n > 0 for n in got.values())


def test_failover_sticky_index_and_counters(sf_dir):
    """Driver-side unit check of the rotation policy itself: failure
    rotates AND sticks (the next request starts on the endpoint that
    last worked), counters track per-endpoint failures, and exhaustion
    raises rpcGet's terminal error."""
    from zigchain_indexer_clickhouse_spark.sources.rpc_fetch import (
        failover_transport,
    )

    base = synthetic_rpc_transport(sf_dir)
    p1, p2 = "/block_results?height=1", "/block_results?height=2"
    ep0 = _flaky(base, {p1}, "ep0")
    ep1 = _flaky(base, set(), "ep1")
    t = failover_transport([ep0, ep1])

    t(p1)  # ep0 fails → rotate → ep1 serves
    assert t.state["failures"] == [1, 0]
    assert ep1.served == [p1]
    t(p2)  # sticky: ep1 (the last-working endpoint) serves directly
    assert ep1.served == [p1, p2]
    assert ep0.served == []

    both_down = failover_transport(
        [_flaky(base, {p1}), _flaky(base, {p1})]
    )
    with pytest.raises(RuntimeError, match="All 2 RPC endpoints failed"):
        both_down(p1)
    assert both_down.state["failures"] == [1, 1]


def test_resolve_sync_target(sf_dir):
    """orchestrator.js:67-71: explicit TARGET_MAX_HEIGHT wins outright;
    otherwise the live /status tip; invalid tip raises."""
    from zigchain_indexer_clickhouse_spark.sources.rpc_fetch import (
        failover_transport,
        resolve_sync_target,
    )

    base = synthetic_rpc_transport(sf_dir)
    assert resolve_sync_target(base, target_max_height=123) == 123
    tip = resolve_sync_target(base)
    assert tip == int(
        json.loads(base("/status"))["result"]["sync_info"][
            "latest_block_height"
        ]
    )
    # failover composes: dead first endpoint, live second
    def dead(path):
        raise ConnectionError("down")
    assert resolve_sync_target(failover_transport([dead, base])) == tip

    def junk(path):
        return json.dumps({"result": {"sync_info": {}}})
    with pytest.raises(ValueError, match="Invalid latest_block_height"):
        resolve_sync_target(junk)
