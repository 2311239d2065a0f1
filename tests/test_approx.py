"""Sketch-accuracy gates for the approximate scale path: the
approx_sketch_stats operator compares HLL++ / positional-percentile
sketches to the exact aggregates IN-QUERY and emits within-bound flags
(plus the exact values) — these tests assert the flags hold and that
the exact columns really are exact, so a bound regression fails both
here and at the driver's oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans import registry


def test_sketches_within_error_bounds(spark, sf_dir):
    rows = {
        r["event_type"]: r
        for r in registry.queries()["approx_sketch_stats"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(exact) and rows
    for t, a in rows.items():
        x = exact[t]
        # the exact columns must be exact (independent recomputation)
        assert a["exact_users"] == x["users"]
        assert a["p50"] == x["p50"] and a["p95"] == x["p95"]
        assert a["n_events"] == x["n"]
        # the in-query sketch-vs-exact bound flags must all hold
        assert a["hll_ok"] == 1 and a["p50_ok"] == 1 and a["p95_ok"] == 1, t
