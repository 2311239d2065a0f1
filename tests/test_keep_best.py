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
