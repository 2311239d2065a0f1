"""Quality-aware canonical selection (#175): the survivor must carry
its cluster's max integer quality, clusters must partition the corpus,
and the selection must genuinely differ from min-id keeping when a
cluster's best doc is not its oldest."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from zigchain_indexer_clickhouse_spark.functions.text import (
    stopword_hits,
    tokens,
)
from zigchain_indexer_clickhouse_spark.operators.dedup import (
    _corpus,
    dedup_keep_best,
    near_dup_clusters,
)


def test_keep_best_is_cluster_argmax(spark, sf_dir):
    labels = {
        r.doc_id: r.cluster_id
        for r in near_dup_clusters(spark, sf_dir).collect()
    }
    toks = tokens(F.col("text"))
    q = {
        r.doc_id: r.q_m
        for r in _corpus(spark, sf_dir, near=True)
        .select(
            "doc_id",
            (
                F.least(F.size(toks), F.lit(100)) * 5
                + F.floor(stopword_hits(toks, "en") * 500 / F.size(toks))
            ).alias("q_m"),
        )
        .collect()
    }
    members = defaultdict(list)
    for d, c in labels.items():
        members[c].append(d)

    rows = dedup_keep_best(spark, sf_dir).collect()
    assert len(rows) == len(members)
    min_id_differs = 0
    for r in rows:
        ms = members[r.cluster_id]
        assert r.n_members == len(ms) and r.n_dropped == len(ms) - 1
        best = min(ms, key=lambda d: (-q[d], d))
        assert (r.keep_id, r.keep_q_m) == (best, q[best])
        if best != min(ms):
            min_id_differs += 1
    # every document lands in exactly one cluster
    assert sum(r.n_members for r in rows) == len(labels)
    # the quality argmax must actually diverge from min-id keeping
    # somewhere, or the operator adds nothing over #145
    assert min_id_differs > 0


def test_fk_orphan_check_clean_star(spark, sf_dir):
    """The generated star is referentially intact — every edge must
    report zero orphans with the right child cardinalities (a nonzero
    here would mean the testdata generator broke, which IS the check
    this operator exists to catch in a real indexer)."""
    from zigchain_indexer_clickhouse_spark.catalog import load
    from zigchain_indexer_clickhouse_spark.operators.queue_analytics import (
        fk_orphan_check,
    )

    rows = {r.fk_edge: r for r in fk_orphan_check(spark, sf_dir).collect()}
    n_li = load(spark, sf_dir, "lineitem").count()
    n_o = load(spark, sf_dir, "orders").count()
    assert set(rows) == {
        "lineitem->orders", "orders->customer",
        "lineitem->part", "lineitem->supplier",
    }
    assert rows["lineitem->orders"].n_child == n_li
    assert rows["orders->customer"].n_child == n_o
    assert all(r.n_orphans == 0 for r in rows.values())


def test_dup_graph_triangles_matches_recompute(spark, sf_dir):
    from zigchain_indexer_clickhouse_spark.operators.dedup import (
        dedup_minhash_lsh,
        dup_graph_triangles,
    )

    pairs = {(r.doc_a, r.doc_b)
             for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    from collections import defaultdict as _dd
    adj = _dd(set)
    nodes = set()
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
        nodes.update((a, b))
    tri = 0
    for a, b in pairs:
        tri += sum(1 for c in adj[a] & adj[b] if c > b)
    row = dup_graph_triangles(spark, sf_dir).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (
        len(nodes), len(pairs), tri
    )
    assert row.triangles_per_medge == (
        tri * 1_000_000 // len(pairs) if pairs else 0
    )
    assert tri > 0  # the planted dup groups must actually close triangles
