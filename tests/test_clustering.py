"""k-means (clustering.py #136): Lloyd-invariant tests — inertia
monotonically non-increasing per iteration, assignment optimality, and
zero-shuffle assignment plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from zigchain_indexer_clickhouse_spark.operators.clustering import (
    KMEANS_ITERS,
    KMEANS_K,
    _assign,
    _quantized,
    _update,
    kmeans_lloyd,
)


def test_inertia_monotone_nonincreasing(spark, sf_dir):
    """Lloyd's invariant: total inertia (Σ dist²) never increases
    across iterations (floored-integer centroids can add ±1 per dim of
    rounding slack, so allow a d·n absolute tolerance)."""
    quant = _quantized(spark, sf_dir).persist()
    centroids = {
        int(r.vec_id): list(r.q)
        for r in quant.filter(F.col("vec_id") < KMEANS_K).collect()
    }
    n = quant.count()
    slack = 64 * n  # 1 unit of floor-rounding per dim per vector
    inertias = []
    for _ in range(KMEANS_ITERS):
        assigned = _assign(quant, centroids)
        inertias.append(assigned.agg(F.sum("dist2")).collect()[0][0])
        new = _update(assigned)
        centroids = {c: new.get(c, centroids[c]) for c in centroids}
    inertias.append(
        _assign(quant, centroids).agg(F.sum("dist2")).collect()[0][0]
    )
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a + slack, inertias


def test_assignment_is_argmin_and_plan_joinless(spark, sf_dir):
    res = kmeans_lloyd(spark, sf_dir)
    rows = res.collect()
    assert {r.cluster for r in rows} <= set(range(KMEANS_K))
    assert all(r.dist2 >= 0 for r in rows)
    # assignment stage must be join-free (literal centroids)
    quant = _quantized(spark, sf_dir)
    centroids = {
        int(r.vec_id): list(r.q)
        for r in quant.filter(F.col("vec_id") < KMEANS_K).collect()
    }
    plan = (
        _assign(quant, centroids)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Exchange" not in plan
