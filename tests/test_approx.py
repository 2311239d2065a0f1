"""Sketch-accuracy gates for the approximate scale path: the rows-only
approx_sketch_stats operator must track the exact aggregates within its
algorithms' published error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans import registry


def test_sketches_within_error_bounds(spark, sf_dir):
    approx = {
        r["event_type"]: r
        for r in registry.queries()["approx_sketch_stats"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for t, a in approx.items():
        x = exact[t]
        # HLL++ rsd 0.05 → generous 3-sigma gate
        assert abs(a["approx_users"] - x["users"]) <= max(3, 0.15 * x["users"])
        # positional percentile sketch: value-space tolerance via a
        # small quantile band around the exact answer
        spread = x["p95"] - x["p50"] + 1e-9
        assert abs(a["p50_sketch"] - x["p50"]) <= 0.1 * spread
        assert abs(a["p95_sketch"] - x["p95"]) <= 0.1 * spread
