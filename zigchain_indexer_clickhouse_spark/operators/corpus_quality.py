"""Corpus-quality operators for training-data pipelines
(SURVEY.md §2.3 #128-130): unigram-LM quality scoring, fixed-window
segment-level dedup, and fuzzy (MinHash) benchmark contamination.

These extend curation.py's filters with the three checks large-corpus
builders run after exact dedup: a language-model quality score (the
CCNet recipe: score each document under a corpus LM), sub-document
dedup at segment granularity (the line/paragraph-dedup analog for
token-stream corpora), and NEAR-duplicate benchmark contamination
(contamination_check in curation.py is exact 5-gram overlap; evals
leak into training sets slightly EDITED, which only fuzzy matching
catches).

All hash math is portable (md5-based, see functions/hashing.py) and all
score arithmetic is integer, so the DuckDB oracle replays every result
bit-exactly — no libm log() drift, no float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.functions.hashing import (
    portable_hash,
    portable_hash_sql,
)
from zigchain_indexer_clickhouse_spark.operators.dedup import (
    JACCARD_MIN,
    _shared_stage,
    hashed_shingle_sets,
    lsh_band_rows,
    minhash_perm_sql,
    MINHASH_K,
    LSH_BANDS,
)
from zigchain_indexer_clickhouse_spark.plans.registry import register

SEGMENT_TOKENS = 16
# Every 23rd document stands in for a benchmark/eval set.
BENCH_MOD = 23


# --------------------------------------------------------------------------
# 128. unigram_lm_score — CCNet-style corpus-LM document scoring
# --------------------------------------------------------------------------
@register(
    "unigram_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    per_doc AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(v.cnt) AS sum_cnt
      FROM tok t JOIN vocab v USING (tok) GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum_cnt * 1000000000 // (n_tokens * total)
                AS BIGINT) AS score_ppb
    FROM per_doc, tot
    """,
)
def unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score (the CCNet recipe, arXiv:1911.00359,
    with a unigram model standing in for the KenLM 5-gram): train a
    LM on the corpus itself, score each document by its mean token
    probability, and bucket/filter on the score downstream. Documents
    of common, fluent tokens score high; gibberish and boilerplate-of-
    rare-symbols score low.

    score_ppb = mean token probability in parts-per-billion
              = (Σ_t count(t)) · 1e9 ÷ (n_tokens · total_tokens)
    — all-integer (exact in the oracle; the single product stays under
    2^63 up to ~1e9-token corpora; beyond that, switch the final ratio
    to double and round).

    Plan: one agg on token for the LM, one equi-join token→count (the
    LM is corpus-sized — a real join, not a broadcast), one agg back to
    doc_id, then a 1-row total broadcast-crossed in. Three shuffles on
    narrow (token|doc_id, long) rows; text itself never shuffles."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    per_doc = (
        tok.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("cnt").alias("sum_cnt"))
    )
    return (
        per_doc.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr(
                "CAST(sum_cnt * 1000000000 DIV (n_tokens * total) AS BIGINT)"
            ).alias("score_ppb"),
        )
    )


# --------------------------------------------------------------------------
# 129. segment_dedup — fixed-window sub-document dedup (line-dedup analog)
# --------------------------------------------------------------------------
def _segment_oracle() -> str:
    h = portable_hash_sql("seg")
    s = SEGMENT_TOKENS
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents
      WHERE doc_id % 2 = 0
    ),
    tok AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM corpus),
    seg AS (
      SELECT doc_id,
             array_to_string(toks[(g.i * {s} + 1):((g.i + 1) * {s})], ' ') AS seg
      FROM tok, generate_series(0, 4000) g(i)
      WHERE g.i * {s} < len(toks)
    ),
    sh AS (SELECT doc_id, {h} AS segh FROM seg),
    cnt AS (SELECT segh, COUNT(*) AS c FROM sh GROUP BY segh)
    SELECT sh.doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_segments,
           CAST(SUM(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS dup_ratio_bp
    FROM sh JOIN cnt USING (segh)
    GROUP BY sh.doc_id
    """


@register("segment_dedup", oracle=_segment_oracle())
def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup at fixed {SEGMENT_TOKENS}-token segment
    granularity — the token-stream analog of line/paragraph dedup
    (C4/RefinedWeb drop repeated lines; token corpora drop repeated
    windows). Corpus = documents + exact copies of the even half, so
    known duplicated segments exist. Per doc: segment count, how many
    of its segments appear elsewhere too, and the duplicated ratio in
    basis points (integer, oracle-exact).

    Plan: segments are built in expression land (sequence → slice →
    join), hashed BEFORE leaving the doc row, then one agg on the
    60-bit segment hash + one equi-join back. Only (doc_id, hash)
    longs ride the shuffles — at 100 TB the segment text never moves,
    the same discipline as dedup_exact."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionAll(
        d.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    toks = corpus.select(
        "doc_id", F.split(F.trim("text"), " ").alias("toks")
    )
    s = SEGMENT_TOKENS
    segs = F.transform(
        F.sequence(
            F.lit(0), F.expr(f"CAST((size(toks) - 1) DIV {s} AS INT)")
        ),
        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i * s + 1, F.lit(s))),
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(segs, lambda seg: portable_hash(seg))
        ).alias("segh"),
    )
    cnt = sh.groupBy("segh").agg(F.count("*").alias("c"))
    return (
        sh.join(cnt, "segh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("c") > 1).cast("long")).alias("n_dup_segments"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_dup_segments",
            F.expr(
                "CAST(n_dup_segments * 10000 DIV n_segments AS BIGINT)"
            ).alias("dup_ratio_bp"),
        )
    )


# --------------------------------------------------------------------------
# 130. contamination_fuzzy — MinHash near-dup benchmark contamination
# --------------------------------------------------------------------------
def _fuzzy_oracle() -> str:
    base = portable_hash_sql("shingle")
    perms = " ".join(
        f"WHEN s.j = {j} THEN {minhash_perm_sql('bh', j)}"
        for j in range(MINHASH_K)
    )
    return f"""
    WITH bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {BENCH_MOD} = 0
    ),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {BENCH_MOD} <> 0
      UNION ALL
      SELECT doc_id + 10000 AS doc_id,
             substring(text, instr(text, ' ') + 1) AS text
      FROM bench
    ),
    pool AS (
      SELECT doc_id, text, 1 AS is_bench FROM bench
      UNION ALL
      SELECT doc_id, text, 0 AS is_bench FROM corpus
    ),
    tok AS (SELECT doc_id, is_bench, string_split(trim(text), ' ') AS toks
            FROM pool WHERE len(string_split(trim(text), ' ')) >= 3),
    shd AS (
      SELECT DISTINCT doc_id, is_bench,
             toks[g.i] || ' ' || toks[g.i+1] || ' ' || toks[g.i+2] AS shingle
      FROM tok, generate_series(1, 4000) g(i)
      WHERE g.i <= len(toks) - 2
    ),
    shh AS (SELECT DISTINCT doc_id, is_bench, {base} AS bh FROM shd),
    sig AS (
      SELECT doc_id, is_bench, s.j AS j, MIN(CASE {perms} END) AS mh
      FROM shh, generate_series(0, {MINHASH_K - 1}) s(j)
      GROUP BY doc_id, is_bench, s.j
    ),
    sigl AS (SELECT doc_id, is_bench, list(mh ORDER BY j) AS sig
             FROM sig GROUP BY doc_id, is_bench),
    bands AS (
      SELECT doc_id, is_bench,
             CAST(b.b AS VARCHAR) || ':' || CAST(sig[2*b.b+1] AS VARCHAR)
               || ':' || CAST(sig[2*b.b+2] AS VARCHAR) AS band_key
      FROM sigl, generate_series(0, {LSH_BANDS - 1}) b(b)
    ),
    cand AS (
      SELECT DISTINCT c.doc_id AS doc_id, b.doc_id AS bench_id
      FROM bands c JOIN bands b
        ON c.band_key = b.band_key AND c.is_bench = 0 AND b.is_bench = 1
    ),
    jac AS (
      SELECT c.doc_id, c.bench_id,
             COUNT(CASE WHEN y.bh IS NOT NULL THEN 1 END) * 1.0
               / (COUNT(DISTINCT x.bh)
                  + (SELECT COUNT(*) FROM shh z
                     WHERE z.doc_id = c.bench_id AND z.is_bench = 1)
                  - COUNT(CASE WHEN y.bh IS NOT NULL THEN 1 END)) AS j
      FROM cand c
      JOIN shh x ON x.doc_id = c.doc_id AND x.is_bench = 0
      LEFT JOIN shh y ON y.doc_id = c.bench_id AND y.is_bench = 1
                     AND y.bh = x.bh
      GROUP BY c.doc_id, c.bench_id
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
           ROUND(MAX(j), 4) AS max_jaccard
    FROM jac WHERE j >= {JACCARD_MIN}
    GROUP BY doc_id
    """


@register("contamination_fuzzy", oracle=_fuzzy_oracle())
def contamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate benchmark contamination: evals leak into training
    corpora lightly edited (whitespace, a dropped sentence), which the
    exact 5-gram check (contamination_check, curation.py) misses. Here
    every {BENCH_MOD}th document plays the benchmark; the corpus holds
    the rest plus a first-token-dropped copy of each benchmark doc
    (known near-miss positives). MinHash-LSH generates corpus×bench
    candidates by band-bucket EQUI-join — never all pairs — and exact
    Jaccard ≥ {JACCARD_MIN} on the hashed shingle sets confirms.
    Output: contaminated corpus doc → how many benchmark docs it
    matches, and the worst overlap.

    Plan: shares hashed_shingle_sets / lsh_band_rows with
    dedup_minhash_lsh (dedup.py) — one md5 per shingle, arithmetic
    perms, band join carries only (doc_id, band_key). The verify join
    touches candidate pairs only. Benchmark sets are small (thousands
    of docs), so the bench band side broadcasts at real scale."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % BENCH_MOD == 0)
    corpus = d.filter(F.col("doc_id") % BENCH_MOD != 0).unionAll(
        bench.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    # memoized persisted stages (dedup._shared_stage): repeat calls in
    # one session reuse them, and eviction unpersists them when the
    # corpus changes — no per-call cache leak
    bench_h = _shared_stage(
        "contam_bench_hashed", spark, sf_dir,
        lambda: hashed_shingle_sets(bench),
    )
    corpus_h = _shared_stage(
        "contam_corpus_hashed", spark, sf_dir,
        lambda: hashed_shingle_sets(corpus),
    )
    bench_bands = lsh_band_rows(bench_h).withColumnRenamed("doc_id", "bench_id")
    corpus_bands = lsh_band_rows(corpus_h)
    cand = (
        corpus_bands.join(F.broadcast(bench_bands), "band_key")
        .select("doc_id", "bench_id")
        .distinct()
    )
    jac = (
        cand.join(corpus_h, "doc_id")
        .join(
            F.broadcast(
                bench_h.select(
                    F.col("doc_id").alias("bench_id"), F.col("bh").alias("bh_b")
                )
            ),
            "bench_id",
        )
        .select(
            "doc_id",
            "bench_id",
            (
                F.size(F.array_intersect("bh", "bh_b"))
                / F.size(F.array_union("bh", "bh_b"))
            ).alias("j"),
        )
        .filter(F.col("j") >= JACCARD_MIN)
    )
    return jac.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bench_matches"),
        F.round(F.max("j"), 4).alias("max_jaccard"),
    )


# --------------------------------------------------------------------------
# 181. source_overlap_matrix — cross-source n-gram contamination matrix
# --------------------------------------------------------------------------
def _source_overlap_oracle() -> str:
    from zigchain_indexer_clickhouse_spark.functions.hashing import (
        portable_hash_sql,
    )

    gram = "(toks[s.i] || ' ' || toks[s.i + 1] || ' ' || toks[s.i + 2])"
    return f"""
    WITH tok AS (
      SELECT source, string_split(trim(text), ' ') AS toks FROM documents
    ),
    sh AS (
      SELECT DISTINCT source, {portable_hash_sql(gram)} AS h
      FROM tok, generate_series(1, 4000) s(i)
      WHERE s.i <= len(toks) - 2
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source)
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared,
           CAST(COUNT(*) * 1000000
                // (sa.n + sb.n - COUNT(*)) AS BIGINT) AS jaccard_ppm
    FROM sh a
    JOIN sh b ON a.h = b.h AND a.source < b.source
    JOIN sizes sa ON sa.source = a.source
    JOIN sizes sb ON sb.source = b.source
    GROUP BY a.source, b.source, sa.n, sb.n
    """


@register("source_overlap_matrix", oracle=_source_overlap_oracle())
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix — per pair of corpus sources,
    how many distinct 3-word shingles they share and the Jaccard in
    ppm. This is the dataset-governance report behind "did source A
    scrape source B": contamination_check/#130 test documents against
    a BENCHMARK; this audits the corpus against ITSELF, pairwise by
    provenance.

    Scale shape: shingles hash in expression land and collapse to
    DISTINCT (source, hash) rows before anything joins — the unit of
    work is the source-level shingle VOCABULARY, not the corpus. The
    pair join keys on the hash; each hash's group is bounded by the
    number of sources (not documents), so worst-case pair fan-out per
    hash is C(n_sources, 2) — a governance-dashboard cardinality, with
    the sizes dimension broadcast back onto the pairs."""
    from zigchain_indexer_clickhouse_spark.functions.hashing import (
        portable_hash,
    )

    d = load(spark, sf_dir, "documents").select(
        "source", F.split(F.trim("text"), " ").alias("toks")
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: portable_hash(
            F.concat_ws(" ", F.slice(F.col("toks"), i + 1, F.lit(3)))
        ),
    )
    sh = (
        d.filter(F.size("toks") >= 3)
        .select("source", F.explode(grams).alias("h"))
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count("*").alias("n"))
    a = sh.select(F.col("h").alias("jh"), F.col("source").alias("src_a"))
    b = sh.select(F.col("h").alias("jh"), F.col("source").alias("src_b"))
    pairs = (
        a.join(b, "jh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"),
                                     F.col("n").alias("na"))), "src_a"
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"),
                                     F.col("n").alias("nb"))), "src_b"
        )
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.expr("(n_shared * 1000000) div (na + nb - n_shared)")
            .alias("jaccard_ppm"),
        )
    )


# --------------------------------------------------------------------------
# 184. length_gini_by_source — Gini concentration of doc lengths
# --------------------------------------------------------------------------
@register(
    "length_gini_by_source",
    oracle="""
    WITH l AS (
      SELECT source, doc_id,
             len(string_split(trim(text), ' ')) AS n_words
      FROM documents
    ),
    r AS (
      SELECT source, n_words,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_words, doc_id) AS i,
             COUNT(*) OVER (PARTITION BY source) AS n,
             SUM(n_words) OVER (PARTITION BY source) AS tot
      FROM l
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(tot) AS BIGINT) AS total_words,
           CAST(SUM((2 * i - n - 1) * n_words) * 1000000
                // (MAX(n) * MAX(tot)) AS BIGINT) AS gini_ppm
    FROM r GROUP BY source
    """,
)
def length_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of document lengths per source — the corpus
    diversity report: a source whose token mass sits in a few huge
    documents (high Gini) behaves very differently under
    sequence packing and per-doc sampling than one with uniform
    lengths, and a Gini jump between crawl snapshots flags a scrape
    regression.

    Integer-exact via the rank formula ``G = Σ(2i − n − 1)·x_(i) /
    (n·Σx)`` in ppm: ties contribute a fixed coefficient sum
    regardless of their internal order, and the row_number tie-break
    (doc_id) makes both engines walk the identical permutation anyway.
    One per-source window (rank + the two per-key totals ride the same
    partitioning) + one aggregate — a single exchange."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.trim("text"), " ")).alias("n_words"),
    )
    wr = Window.partitionBy("source").orderBy("n_words", "doc_id")
    wt = Window.partitionBy("source")
    r = d.select(
        "source",
        "n_words",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wt).alias("n"),
        F.sum("n_words").over(wt).alias("tot"),
    )
    return r.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.max("tot").cast("long").alias("total_words"),
        F.expr(
            "(sum((2 * i - n - 1) * n_words) * 1000000)"
            " div (max(n) * max(tot))"
        ).alias("gini_ppm"),
    )


# --------------------------------------------------------------------------
# 205. simpson_diversity_by_source — Gini-Simpson token diversity
# --------------------------------------------------------------------------
@register(
    "simpson_diversity_by_source",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(trim(text), ' ')) AS token
      FROM documents
    ),
    c AS (
      SELECT source, token, COUNT(*) AS c FROM tok GROUP BY source, token
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST((SUM(c) * SUM(c) - SUM(c * c)) * 1000000
                // (SUM(c) * SUM(c)) AS BIGINT) AS simpson_ppm
    FROM c GROUP BY source
    """,
)
def simpson_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-Simpson token diversity per source — the probability (ppm)
    that two tokens drawn at random from a source differ: ``1 - Σc²/N²``.
    The diversity twin of #184's length-Gini: a source whose token mass
    collapses onto a few types (low Simpson) is boilerplate- or
    template-dominated and behaves badly under dedup and LM training;
    unlike Shannon entropy this needs NO log(), so it is integer-exact
    cross-engine (the file-header rule).

    Scale shape: (source, token) counts are a map-side-combinable
    keyed agg — the exchange carries the per-source token VOCABULARY,
    already collapsed per task; the Σc² reduction is a second tiny agg
    on vocabulary rows keyed by source (#sources groups). No windows,
    no joins. BIGINT headroom: N per source must stay < 3·10⁹ for N²
    to fit; at 100 TB the same query runs with the ppm arithmetic in
    DECIMAL(38) — the structure is unchanged."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.trim("text"), " ")).alias("token")
    )
    c = tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    return c.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.expr(
            "(sum(c) * sum(c) - sum(c * c)) * 1000000"
            " div (sum(c) * sum(c))"
        ).cast("long").alias("simpson_ppm"),
    )
