"""Connected-components (star contraction) correctness tests.

`propagate_components` switched from O(diameter) min-label propagation
to alternating large-star/small-star contraction (Kiveris et al.,
SoCC'14) in round 5 — replica chains in dup graphs make diameter grow
with corpus size, which the 10× scale probe measured as a 10.6× round
blow-up. These tests pin the new path against an independent Python
union-find ground truth on adversarial graph shapes, including a long
chain whose diameter exceeds the OLD implementation's 20-round cap —
the exact case the rewrite exists for — plus the minlabel reference
implementation on small-diameter graphs.
"""

from __future__ import annotations

import random

import pytest

from zigchain_indexer_clickhouse_spark.operators.dedup import (
    _propagate_minlabel,
    propagate_components,
)


def _union_find_labels(edges, extra_nodes=()):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    for n in extra_nodes:
        find(n)
    # label = min node id of the component
    comp_min = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


def _spark_labels(spark, edges, extra_nodes=None):
    base = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)], "a long, b long"
    )
    if not edges:
        base = base.limit(0)
    nodes = None
    if extra_nodes is not None:
        nodes = spark.createDataFrame(
            [(int(n),) for n in extra_nodes], "n long"
        )
    out = propagate_components(base, nodes=nodes)
    return {r["n"]: r["label"] for r in out.collect()}


def test_long_chain_beyond_old_round_cap(spark):
    """A 150-node chain has diameter 149 — far past the old min-label
    20-round cap. Star contraction must still collapse it to one
    component labeled by the min node."""
    edges = [(i, i + 1) for i in range(150)]
    got = _spark_labels(spark, edges)
    assert set(got) == set(range(151))
    assert set(got.values()) == {0}


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randrange(30, 140))
    ]
    extra = [n + i for i in range(5)]  # isolated → singleton labels
    got = _spark_labels(spark, edges, extra_nodes=extra)
    want = _union_find_labels(
        [(a, b) for a, b in edges if a != b],
        extra_nodes=[a for a, b in edges if a == b] + extra,
    )
    assert got == want


def test_star_matches_minlabel_small_diameter(spark):
    """On a small-diameter graph both implementations are in contract;
    keeps the minlabel reference honest as a cross-check."""
    rng = random.Random(3)
    stars = [(c, c + 1000 + i) for c in (0, 5, 9) for i in range(8)]
    bridges = [(0, 5)]
    edges = stars + bridges + [(rng.randrange(20), rng.randrange(20)) for _ in range(10)]
    base = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a long, b long"
    )
    star = {
        r["n"]: r["label"] for r in propagate_components(base).collect()
    }
    minl = {
        r["n"]: r["label"] for r in _propagate_minlabel(base).collect()
    }
    assert star == minl


def test_empty_edges_isolated_only(spark):
    got = _spark_labels(spark, [], extra_nodes=[3, 8, 12])
    assert got == {3: 3, 8: 8, 12: 12}
