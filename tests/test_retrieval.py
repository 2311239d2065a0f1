"""Retrieval/sketch operators (retrieval.py #138-140): BM25 ordering
sanity, inverted-index integrity, Bloom no-false-negative guarantee
and FP rate vs the design point."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.operators.retrieval import (
    BLOOM_BITS,
    BLOOM_HASHES,
    BM25_QUERY,
    bloom_membership,
    bm25_rank,
    inverted_index_build,
)


def test_bm25_scores_positive_and_query_tokens_present(spark, sf_dir):
    rows = bm25_rank(spark, sf_dir).collect()
    assert rows and all(r.bm25 > 0 for r in rows)
    # every scored doc really contains a query token
    d = load(spark, sf_dir, "documents")
    with_term = d.filter(
        F.arrays_overlap(
            F.split(F.trim("text"), " "),
            F.array(*[F.lit(t) for t in BM25_QUERY]),
        )
    ).count()
    assert len(rows) == with_term


def test_inverted_index_postings_sorted_and_df_consistent(spark, sf_dir):
    rows = inverted_index_build(spark, sf_dir).collect()
    assert rows
    n_docs = load(spark, sf_dir, "documents").count()
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids) and len(ids) == len(set(ids))
        assert r.df == len(ids) and r.df <= n_docs


def test_bloom_no_false_negatives_and_fp_near_design(spark, sf_dir):
    row = bloom_membership(spark, sf_dir).collect()[0]
    n_keys = row.n_probes // 2
    # Bloom filters NEVER miss a present key
    assert row.n_true_hits == n_keys
    # realized FP rate within 5x of the (1 - e^{-kn/m})^k design point
    # (generous: small-n variance)
    p = (1 - math.exp(-BLOOM_HASHES * n_keys / BLOOM_BITS)) ** BLOOM_HASHES
    assert row.n_false_positives <= max(20, 5 * p * n_keys)
