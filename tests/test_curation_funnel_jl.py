"""Composed curation funnel (#170) and JL sign projection (#171):
funnel stages must be consistent with the standalone gate operators
they compose, and the projection must match an exact integer
recompute plus preserve the ±1-matrix structure."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.operators.curation import (
    curation_funnel,
    gopher_quality_filter,
    repetition_filter,
)
from zigchain_indexer_clickhouse_spark.operators.similarity import (
    JL_HASH_A,
    JL_IN_DIM,
    JL_OUT_DIM,
    jl_random_projection,
)


def test_funnel_monotone_and_consistent_with_gate_ops(spark, sf_dir):
    rows = {r.stage: (r.docs, r.tokens)
            for r in curation_funnel(spark, sf_dir).collect()}
    assert list(rows) == ["s0_all", "s1_gopher", "s2_repetition", "s3_dedup"]
    stages = [rows[s] for s in ("s0_all", "s1_gopher", "s2_repetition",
                                "s3_dedup")]
    for (d0, t0), (d1, t1) in zip(stages, stages[1:]):
        assert d1 <= d0 and t1 <= t0  # a funnel only loses mass

    # s0 = corpus, s1 = standalone gopher gate survivors
    docs = load(spark, sf_dir, "documents")
    assert rows["s0_all"][0] == docs.count()
    gopher_pass = {
        r.doc_id for r in gopher_quality_filter(spark, sf_dir).collect()
        if r.keep == 1
    }
    assert rows["s1_gopher"][0] == len(gopher_pass)
    # s2 = gopher ∩ repetition survivors (standalone ops agree)
    rep_pass = {
        r.doc_id for r in repetition_filter(spark, sf_dir).collect()
        if r.keep == 1
    }
    assert rows["s2_repetition"][0] == len(gopher_pass & rep_pass)


def _sign(j: int, d: int) -> int:
    return 1 if ((j * 101 + d) * JL_HASH_A) % 4294967296 >> 16 & 1 == 0 \
        else -1


def test_jl_projection_matches_integer_recompute(spark, sf_dir):
    emb = {
        r.vec_id: r.embedding
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    out = jl_random_projection(spark, sf_dir).collect()
    assert len(out) == len(emb)
    for r in out[:25]:
        q = [round(float(v) * 1000) for v in emb[r.vec_id]]
        expect = [
            sum(q[d] * _sign(j, d) for d in range(JL_IN_DIM))
            for j in range(JL_OUT_DIM)
        ]
        assert json.loads(r.proj_json) == expect


def test_jl_sign_matrix_is_balanced():
    """The hash-derived ±1 matrix must not be degenerate: each output
    dimension mixes both signs (a constant-sign row would just sum the
    vector, losing the JL distance-preservation property)."""
    for j in range(JL_OUT_DIM):
        signs = [_sign(j, d) for d in range(JL_IN_DIM)]
        assert 8 <= signs.count(1) <= JL_IN_DIM - 8, (j, signs.count(1))


def test_jl_plan_is_shuffle_free(spark, sf_dir):
    plan = (
        jl_random_projection(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
