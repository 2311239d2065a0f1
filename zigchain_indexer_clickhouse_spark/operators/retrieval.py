"""Retrieval / sketch primitives over the documents and orders tables
(SURVEY.md §2.3 #138-140): BM25 ranking, inverted-index construction,
and an exactly-replayable Bloom-filter membership sweep.

A training-data platform is also a retrieval platform — corpus search
(inverted index + BM25) powers contamination forensics, dedup triage,
and eval-set curation; Bloom filters are how 100 TB pipelines make
"have we seen this key" cheap (ClickHouse's bloom_filter skip index,
Spark's own BloomFilterAggregate in DPP runtime filters).

Determinism: BM25 avoids libm (rational idf, like tfidf_top_terms) and
fixes the term-sum order by summing per-term COLUMNS in one expression
— no float reduction order anywhere. The Bloom filter uses the
portable 60-bit hash for its k probe positions, so even its FALSE
POSITIVES are bit-identical in DuckDB — a sketch whose behavior the
oracle replays exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.functions.hashing import (
    portable_hash,
    portable_hash_sql,
)
from zigchain_indexer_clickhouse_spark.plans.registry import register

# Fixed retrieval query (tokens from the synthetic corpus vocabulary).
BM25_QUERY = ("spark", "merge", "window", "vector")
BM25_K1 = 1.2
BM25_B = 0.75

BLOOM_BITS = 1 << 16
BLOOM_HASHES = 3
BLOOM_PROBE_SHIFT = 7_777_777  # offset used to synthesize known misses


# --------------------------------------------------------------------------
# 138. bm25_rank — BM25 document ranking for a fixed term query
# --------------------------------------------------------------------------
def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    # one pivoted tf column per query term; score summed in fixed
    # column order (no float reduction-order drift)
    tf_cols = ", ".join(
        f"SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS tf_{t}"
        for t in BM25_QUERY
    )
    score_terms = " + ".join(
        f"""((stats.n_docs - df.df_{t} + 0.5) / (df.df_{t} + 0.5))
            * (d.tf_{t} * {BM25_K1 + 1})
            / (d.tf_{t} + {BM25_K1} * (1 - {BM25_B}
               + {BM25_B} * d.dl / stats.avgdl))"""
        for t in BM25_QUERY
    )
    df_cols = ", ".join(
        f"COUNT(DISTINCT CASE WHEN tok = '{t}' THEN doc_id END) AS df_{t}"
        for t in BM25_QUERY
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS dl, {tf_cols}
      FROM tok GROUP BY doc_id
    ),
    df AS (SELECT {df_cols} FROM tok WHERE tok IN ({terms})),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) * 1.0 / COUNT(*) AS avgdl
      FROM per_doc
    )
    SELECT d.doc_id, ROUND({score_terms}, 4) AS bm25
    FROM per_doc d, df, stats
    WHERE {" + ".join(f"d.tf_{t}" for t in BM25_QUERY)} > 0
    """


@register("bm25_rank", oracle=_bm25_oracle())
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1={BM25_K1}, b={BM25_B}) over the corpus for a fixed
    {len(BM25_QUERY)}-term query, rational idf (N-df+0.5)/(df+0.5) —
    no log(), same discipline as tfidf_top_terms, so the oracle is
    bit-exact. Per-term scores live in pivoted COLUMNS and sum in one
    fixed-order expression: no float reduction order anywhere.

    Plan: ONE pass over tokens builds (dl, tf per query term) per doc
    — conditional aggregates, not |query| joins; the df/N/avgdl stats
    collapse to single-row broadcasts. At 100 TB this is a scan + one
    doc-keyed agg; the query-dependent work is O(|query|) columns."""
    return _bm25_scores(spark, sf_dir)


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for the fixed query — shared by bm25_rank and
    hybrid_rank_fusion so the lexical leg is computed exactly once in
    source. See bm25_rank's docstring for the plan shape."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum((F.col("tok") == t).cast("long")).alias(f"tf_{t}")
            for t in BM25_QUERY
        ],
    )
    dfs = tok.filter(F.col("tok").isin(*BM25_QUERY)).agg(
        *[
            F.countDistinct(
                F.when(F.col("tok") == t, F.col("doc_id"))
            ).alias(f"df_{t}")
            for t in BM25_QUERY
        ]
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count("*")).alias("avgdl"),
    )
    score = None
    for t in BM25_QUERY:
        idf = ((F.col("n_docs") - F.col(f"df_{t}") + 0.5)
               / (F.col(f"df_{t}") + 0.5))
        tf = F.col(f"tf_{t}")
        term = idf * (tf * (BM25_K1 + 1)) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
        score = term if score is None else score + term
    any_tf = None
    for t in BM25_QUERY:
        any_tf = (
            F.col(f"tf_{t}")
            if any_tf is None
            else any_tf + F.col(f"tf_{t}")
        )
    return (
        per_doc.crossJoin(F.broadcast(dfs))
        .crossJoin(F.broadcast(stats))
        .filter(any_tf > 0)
        .select("doc_id", F.round(score, 4).alias("bm25"))
    )


# --------------------------------------------------------------------------
# 139. inverted_index_build — token → posting list
# --------------------------------------------------------------------------
@register(
    "inverted_index_build",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    )
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
    FROM tok GROUP BY tok
    """,
)
def inverted_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: token → document-frequency + sorted posting
    list (comma-joined so the oracle hash is representation-stable).
    The retrieval primitive behind corpus search, and what
    contamination forensics walks when a benchmark term flags.

    Plan: distinct (doc, token) then ONE agg on token; postings sort
    happens inside each token's group (array_sort over collect_list,
    expression-land). At 100 TB posting lists for stop-word-like
    tokens get huge — production shards them (token, doc_id DIV n)
    like vocab_top_tokens notes; here df stays bounded by corpus
    design."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    ).distinct()
    return tok.groupBy("tok").agg(
        F.count("*").cast("long").alias("df"),
        F.array_join(
            F.array_sort(F.collect_list("doc_id")), ","
        ).alias("postings"),
    )


# --------------------------------------------------------------------------
# 140. bloom_membership — exactly-replayable Bloom filter build + probe
# --------------------------------------------------------------------------
@register(
    "bloom_membership",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    bits AS (
      SELECT DISTINCT ({portable_hash_sql("k", "'bloom' || CAST(g.j AS VARCHAR)")})
               % {BLOOM_BITS} AS pos
      FROM keys, generate_series(0, {BLOOM_HASHES - 1}) g(j)
    ),
    probes AS (
      SELECT k AS probe, 1 AS is_real FROM keys
      UNION ALL
      SELECT k + {BLOOM_PROBE_SHIFT} AS probe, 0 AS is_real FROM keys
    ),
    probe_pos AS (
      SELECT p.probe, p.is_real,
             ({portable_hash_sql("p.probe", "'bloom' || CAST(g.j AS VARCHAR)")})
               % {BLOOM_BITS} AS pos
      FROM probes p, generate_series(0, {BLOOM_HASHES - 1}) g(j)
    ),
    verdicts AS (
      SELECT pp.probe, pp.is_real,
             CASE WHEN COUNT(b.pos) = {BLOOM_HASHES} THEN 1 ELSE 0 END AS member
      FROM probe_pos pp LEFT JOIN bits b ON b.pos = pp.pos
      GROUP BY pp.probe, pp.is_real
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN is_real = 1 THEN member ELSE 0 END) AS BIGINT)
             AS n_true_hits,
           CAST(SUM(CASE WHEN is_real = 0 THEN member ELSE 0 END) AS BIGINT)
             AS n_false_positives,
           CAST(SUM(CASE WHEN is_real = 0 THEN member ELSE 0 END) * 1000000
                // SUM(CASE WHEN is_real = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS fp_rate_ppm
    FROM verdicts
    """,
)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter ({BLOOM_BITS} bits, k={BLOOM_HASHES}) over order
    keys, probed with every real key plus a shifted copy (known
    misses). Because the probe positions come from the portable hash,
    the filter's exact false positives — not just their rate — replay
    in the oracle: a SKETCH with a bit-exact cross-engine contract
    (ClickHouse bloom_filter skip index / Spark runtime-filter
    semantics, minus the opaque native bitmaps).

    Every real key must hit (Bloom filters have no false negatives —
    asserted in tests); the shifted keys measure the realized FP rate
    against the (1-e^{{-kn/m}})^k design point.

    Plan: the bit set is a distinct-agg on positions (≤{BLOOM_BITS}
    rows — broadcastable at any corpus size, the point of the
    structure); probing is one equi-join on the position int + a
    count-all-k check. No row ever carries more than two longs."""
    o = load(spark, sf_dir, "orders")
    keys = o.select(F.col("o_orderkey").alias("k")).distinct()

    def positions(col: F.Column) -> F.Column:
        return F.array(
            *[
                portable_hash(col, f"bloom{j}") % BLOOM_BITS
                for j in range(BLOOM_HASHES)
            ]
        )

    bits = (
        keys.select(F.explode(positions(F.col("k"))).alias("pos")).distinct()
    )
    probes = keys.select(F.col("k").alias("probe"), F.lit(1).alias("is_real")).unionAll(
        keys.select(
            (F.col("k") + BLOOM_PROBE_SHIFT).alias("probe"),
            F.lit(0).alias("is_real"),
        )
    )
    probe_pos = probes.select(
        "probe", "is_real", F.explode(positions(F.col("probe"))).alias("pos")
    )
    verdicts = (
        probe_pos.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("probe", "is_real")
        .agg(
            (F.count("hit") == BLOOM_HASHES).cast("int").alias("member")
        )
    )
    return verdicts.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum(F.when(F.col("is_real") == 1, F.col("member")).otherwise(0))
        .cast("long")
        .alias("n_true_hits"),
        F.sum(F.when(F.col("is_real") == 0, F.col("member")).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
        F.expr(
            f"""CAST(SUM(CASE WHEN is_real = 0 THEN member ELSE 0 END)
                 * 1000000 DIV SUM(CASE WHEN is_real = 0 THEN 1 ELSE 0 END)
                 AS BIGINT)"""
        ).alias("fp_rate_ppm"),
    )


# --------------------------------------------------------------------------
# 164. hybrid_rank_fusion — RRF over the lexical (BM25) and semantic
#      (embedding-cosine) legs
# --------------------------------------------------------------------------
RRF_C = 60        # the standard reciprocal-rank-fusion constant
FUSE_TOPK = 20
FUSE_QUERY_VEC = 0  # vec_id of the semantic query vector


def _fusion_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    tf_cols = ", ".join(
        f"SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS tf_{t}"
        for t in BM25_QUERY
    )
    df_cols = ", ".join(
        f"COUNT(DISTINCT CASE WHEN tok = '{t}' THEN doc_id END) AS df_{t}"
        for t in BM25_QUERY
    )
    score_terms = " + ".join(
        f"""((stats.n_docs - df.df_{t} + 0.5) / (df.df_{t} + 0.5))
            * (d.tf_{t} * {BM25_K1 + 1})
            / (d.tf_{t} + {BM25_K1} * (1 - {BM25_B}
               + {BM25_B} * d.dl / stats.avgdl))"""
        for t in BM25_QUERY
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS dl, {tf_cols} FROM tok GROUP BY doc_id
    ),
    df AS (SELECT {df_cols} FROM tok WHERE tok IN ({terms})),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) * 1.0 / COUNT(*) AS avgdl
      FROM per_doc
    ),
    lex AS (
      SELECT doc_id AS id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rnk
      FROM (
        SELECT d.doc_id, ROUND({score_terms}, 4) AS bm25
        FROM per_doc d, df, stats
        WHERE {" + ".join(f"d.tf_{t}" for t in BM25_QUERY)} > 0
      )
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT v AS q FROM e WHERE vec_id = {FUSE_QUERY_VEC}),
    sem AS (
      SELECT vec_id AS id,
             row_number() OVER (ORDER BY cosine DESC, vec_id) AS sem_rnk
      FROM (
        SELECT e.vec_id,
               ROUND(list_dot_product(qv.q, e.v)
                     / (sqrt(list_dot_product(qv.q, qv.q))
                        * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
        FROM e, qv WHERE e.vec_id <> {FUSE_QUERY_VEC}
      )
    )
    SELECT COALESCE(lex.id, sem.id) AS id,
           CAST(lex.lex_rnk AS INT) AS lex_rnk,
           CAST(sem.sem_rnk AS INT) AS sem_rnk,
           CAST(COALESCE(1000000 // ({RRF_C} + lex.lex_rnk), 0)
                + COALESCE(1000000 // ({RRF_C} + sem.sem_rnk), 0)
                AS BIGINT) AS rrf_ppm
    FROM lex FULL OUTER JOIN sem ON lex.id = sem.id
    ORDER BY rrf_ppm DESC, id
    LIMIT {FUSE_TOPK}
    """


@register("hybrid_rank_fusion", oracle=_fusion_oracle())
def hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: reciprocal-rank fusion (RRF, Cormack et al. 2009)
    of the lexical BM25 leg (#138's scorer, shared source) and a
    semantic embedding-cosine leg (query = vec_id {FUSE_QUERY_VEC}),
    the standard way modern retrieval stacks combine an inverted index
    with a vector index. Scores are integer ppm —
    Σ 1000000 DIV ({RRF_C}+rank) over the legs a doc appears in — so
    the fusion is arithmetic-exact on both engines; ranks order by the
    ROUNDed leg scores with id tiebreaks (total order, both engines).

    Plan: each leg ranks with ONE window (lexical: docs matching ≥1
    query term — the posting-list-sized set, not the corpus; semantic:
    broadcast 1-row query vector against the embedding scan), then a
    full-outer equi-join on id fuses and TakeOrderedAndProject keeps
    the top {FUSE_TOPK}. At 100 TB the legs are the existing #138/#37
    shapes; fusion adds one keyed join over candidate sets that are
    tiny by construction (posting lists / ANN shortlists), never the
    corpus."""
    lex_scores = _bm25_scores(spark, sf_dir)
    w_lex = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex = lex_scores.select(
        F.col("doc_id").alias("id"),
        F.row_number().over(w_lex).cast("int").alias("lex_rnk"),
    )
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    qv = e.filter(F.col("vec_id") == FUSE_QUERY_VEC).select(
        F.col("v").alias("q")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = (
        e.filter(F.col("vec_id") != FUSE_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                dot(F.col("q"), F.col("v"))
                / (F.sqrt(dot(F.col("q"), F.col("q")))
                   * F.sqrt(dot(F.col("v"), F.col("v")))),
                6,
            ).alias("cosine"),
        )
    )
    w_sem = Window.orderBy(F.col("cosine").desc(), "vec_id")
    sem = scored.select(
        F.col("vec_id").alias("id"),
        F.row_number().over(w_sem).cast("int").alias("sem_rnk"),
    )
    fused = (
        lex.withColumnRenamed("id", "lid")
        .join(sem.withColumnRenamed("id", "sid"),
              F.col("lid") == F.col("sid"), "full_outer")
        .select(
            F.coalesce("lid", "sid").alias("id"),
            "lex_rnk",
            "sem_rnk",
            (
                F.coalesce(
                    F.expr(f"1000000 DIV ({RRF_C} + lex_rnk)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 DIV ({RRF_C} + sem_rnk)"), F.lit(0)
                )
            ).cast("long").alias("rrf_ppm"),
        )
    )
    return fused.orderBy(F.col("rrf_ppm").desc(), "id").limit(FUSE_TOPK)
