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
        synthetic_rpc_transport(sf_dir)("/status")


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
