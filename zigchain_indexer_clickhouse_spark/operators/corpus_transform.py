"""Corpus TRANSFORM operators (SURVEY.md §2.3 growth, round 6): the
ops that rewrite document text rather than just score or filter it —
the CCNet/RefinedWeb cleaning stages a training-data pipeline runs
between raw crawl and tokenizer.

- ``segment_dedup_reassemble`` (#188): corpus-wide first-occurrence
  segment dedup with document REASSEMBLY — the CCNet paragraph/line
  dedup transform (arXiv:1911.00359 §3.1: every paragraph hashed,
  duplicates dropped, docs rebuilt from survivors). segment_dedup
  (#129) only reports per-doc dup ratios; this one emits the cleaned
  corpus.
- ``boilerplate_strip`` (#189): per-SOURCE frequent-segment removal —
  the header/footer/nav-bar idiom (RefinedWeb/Gopher boilerplate
  stage): a short segment occurring in many distinct documents of one
  source is template text, not content, and is stripped from all of
  them.
- ``ngram_novelty_decay`` (#192): corpus redundancy growth — what
  fraction of each ingest bucket's 3-grams is NOVEL (first seen in
  that bucket)? The curve every corpus owner checks before paying to
  train on the tail (novelty collapses → the crawl is re-reading
  itself).

Reference parity: the reference (a chain indexer) has no text
pipeline; these extend SURVEY §2.3's training-data surface. Scale
shapes are segment/gram-keyed equi-joins and map-side-combinable
aggregates only — no windows over unbounded partitions, no all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.functions.hashing import (
    portable_hash,
    portable_hash_sql,
)
from zigchain_indexer_clickhouse_spark.plans.registry import register

SEG_TOKENS = 16       # reassembly segment width (matches segment_dedup)
BOILER_TOKENS = 2     # boilerplate unit: short template-sized segments
                      # (real corpora would use whole lines; the
                      # synthetic docs are short single-line token
                      # streams, so the unit shrinks with them)
BOILER_MIN_DOCS = 3   # distinct docs within a source ⇒ boilerplate
NOVELTY_BUCKETS = 10  # ingest-order buckets for the novelty curve


def _segments(docs: DataFrame, width: int) -> DataFrame:
    """(doc_id, ...) → exploded (doc_id, idx, seg) non-overlapping
    ``width``-token segments, in expression land (zero shuffle)."""
    toks = F.split(F.trim("text"), " ")
    segs = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / width).cast("int")),
        lambda i: F.struct(
            i.alias("idx"),
            F.concat_ws(
                " ", F.slice(toks, i * width + 1, F.lit(width))
            ).alias("seg"),
        ),
    )
    return docs.select(
        "doc_id", "source", F.explode(segs).alias("s")
    ).select("doc_id", "source", F.col("s.idx").alias("idx"),
             F.col("s.seg").alias("seg"))


def _seg_sql(width: int) -> str:
    """The DuckDB rendering of :func:`_segments` (shared CTE text)."""
    return f"""
    tok AS (
      SELECT doc_id, source, string_split(trim(text), ' ') AS toks
      FROM documents
    ),
    seg AS (
      SELECT doc_id, source, g.i AS idx,
             array_to_string(
               toks[(g.i * {width} + 1):((g.i + 1) * {width})], ' ') AS seg
      FROM tok, generate_series(0, 4000) g(i)
      WHERE g.i * {width} < len(toks)
    )"""


# --------------------------------------------------------------------------
# 188. segment_dedup_reassemble — CCNet line-dedup with doc reassembly
# --------------------------------------------------------------------------
@register(
    "segment_dedup_reassemble",
    oracle=f"""
    WITH {_seg_sql(SEG_TOKENS)},
    sh AS (
      SELECT doc_id, idx, seg, {portable_hash_sql("seg")} AS segh FROM seg
    ),
    r AS (
      SELECT doc_id, idx, seg,
             ROW_NUMBER() OVER (PARTITION BY segh
                                ORDER BY doc_id, idx) AS rn
      FROM sh
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                               ORDER BY idx), '') AS clean_text,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped
    FROM r GROUP BY doc_id
    """,
)
def segment_dedup_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-wide segment dedup with REASSEMBLY
    (arXiv:1911.00359 §3.1): hash every {SEG_TOKENS}-token segment,
    keep only each hash's global FIRST occurrence (lexicographically
    smallest (doc_id, idx) — deterministic under any layout), and
    rebuild every document from its surviving segments in original
    order. Emits the cleaned corpus plus per-doc kept/dropped counts —
    the transform #129 (segment_dedup) only measures.

    Scale shape: first-occurrence selection is a map-side-combinable
    ``min(struct(doc_id, idx))`` groupBy on the segment hash followed
    by one equi-join back — NOT a row_number window, so a boilerplate
    segment with millions of occurrences costs one combinable min, not
    one sorted window partition. Reassembly is a doc-keyed agg with
    expression-land ordering (array_sort over (idx, seg) structs). Two
    narrow shuffles total; document text crosses the wire once."""
    d = load(spark, sf_dir, "documents")
    seg = _segments(d, SEG_TOKENS).withColumn(
        "segh", portable_hash(F.col("seg"))
    )
    first = seg.groupBy("segh").agg(
        F.min(F.struct("doc_id", "idx")).alias("f")
    )
    j = seg.join(first, "segh")
    kept = (F.col("doc_id") == F.col("f.doc_id")) & (
        F.col("idx") == F.col("f.idx")
    )
    return (
        j.withColumn("k", kept)
        .groupBy("doc_id")
        .agg(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("k"), F.struct("idx", "seg")
                                )
                            )
                        ),
                        lambda s: s["seg"],
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("clean_text"),
            F.sum(F.col("k").cast("long")).alias("n_kept"),
            F.sum((~F.col("k")).cast("long")).alias("n_dropped"),
        )
    )


# --------------------------------------------------------------------------
# 189. boilerplate_strip — per-source frequent-segment (template) removal
# --------------------------------------------------------------------------
@register(
    "boilerplate_strip",
    oracle=f"""
    WITH {_seg_sql(BOILER_TOKENS)},
    sh AS (
      SELECT doc_id, source, idx, seg,
             {portable_hash_sql("seg")} AS segh
      FROM seg
    ),
    df AS (
      SELECT source, segh, COUNT(DISTINCT doc_id) AS n_docs
      FROM sh GROUP BY source, segh
    ),
    fl AS (
      SELECT sh.doc_id, sh.source, sh.idx, sh.seg,
             (df.n_docs >= {BOILER_MIN_DOCS}) AS boiler
      FROM sh JOIN df USING (source, segh)
    )
    SELECT doc_id, source,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           COALESCE(string_agg(CASE WHEN NOT boiler THEN seg END, ' '
                               ORDER BY idx), '') AS clean_text
    FROM fl GROUP BY doc_id, source
    """,
)
def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source template removal (the RefinedWeb/Gopher boilerplate
    stage): a {BOILER_TOKENS}-token segment occurring in ≥
    {BOILER_MIN_DOCS} DISTINCT documents of the same source is
    header/footer/nav template text, and every occurrence is stripped
    (unlike #188, which keeps a canonical first copy — templates have
    no canonical home). Emits the cleaned doc plus segment counts.

    Scale shape: the doc-frequency pass is a (source, segh) groupBy on
    countDistinct(doc_id) — two narrow map-side-combinable exchanges
    (the distinct expand, then the agg); the flag join is a (source,
    segh) equi-join; reassembly one doc-keyed agg. The template
    dictionary is never broadcast or collected — at 100 TB it is
    corpus-vocabulary-sized and stays distributed."""
    d = load(spark, sf_dir, "documents")
    seg = _segments(d, BOILER_TOKENS).withColumn(
        "segh", portable_hash(F.col("seg"))
    )
    df_counts = seg.groupBy("source", "segh").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    fl = seg.join(df_counts, ["source", "segh"]).withColumn(
        "boiler", F.col("n_docs") >= BOILER_MIN_DOCS
    )
    return (
        fl.groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.col("boiler").cast("long")).alias("n_boiler"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    ~F.col("boiler"),
                                    F.struct("idx", "seg"),
                                )
                            )
                        ),
                        lambda s: s["seg"],
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("clean_text"),
        )
    )


# --------------------------------------------------------------------------
# 192. ngram_novelty_decay — per-ingest-bucket novel-content fraction
# --------------------------------------------------------------------------
@register(
    "ngram_novelty_decay",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    mx AS (SELECT MAX(doc_id) + 1 AS n_docs FROM tok),
    grams AS (
      SELECT doc_id,
             {portable_hash_sql(
                 "array_to_string(toks[g.i:(g.i + 2)], ' ')")} AS gh
      FROM tok, generate_series(1, 4000) g(i)
      WHERE g.i <= len(toks) - 2
    ),
    firsts AS (SELECT gh, MIN(doc_id) AS first_doc FROM grams GROUP BY gh),
    occ AS (
      SELECT g.doc_id, (g.doc_id = f.first_doc) AS novel
      FROM grams g JOIN firsts f USING (gh)
    )
    SELECT CAST(occ.doc_id * {NOVELTY_BUCKETS} // mx.n_docs AS BIGINT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM occ, mx GROUP BY 1
    """,
)
def ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus redundancy growth: split the corpus into
    {NOVELTY_BUCKETS} equal doc_id ranges (ingest-order proxy) and
    measure, per bucket, the fraction of 3-gram occurrences whose
    FIRST corpus-wide occurrence lands in that bucket's docs — the
    novelty curve that tells a corpus owner when the crawl starts
    re-reading itself (novelty_ppm collapsing toward 0 at the tail
    means the marginal shard adds vocabulary the model has seen).

    Scale shape: gram hashing in expression land; first-occurrence is
    a map-side-combinable min(doc_id) groupBy on the gram hash; one
    equi-join back on the hash; one tiny bucket agg; the doc-count
    bound is a 1-row broadcast. No windows, no all-pairs — the same
    O(corpus) two-shuffle skeleton as the dedup family."""
    toks = F.split(F.trim("text"), " ")
    d = load(spark, sf_dir, "documents")
    grams = d.filter(F.size(toks) >= 3).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: portable_hash(
                    F.concat_ws(" ", F.slice(toks, i + 1, F.lit(3)))
                ),
            )
        ).alias("gh"),
    )
    firsts = grams.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    occ = grams.join(firsts, "gh").select(
        "doc_id", (F.col("doc_id") == F.col("first_doc")).alias("novel")
    )
    mx = d.agg((F.max("doc_id") + 1).alias("n_docs"))
    novel = F.sum(F.col("novel").cast("long"))
    return (
        occ.crossJoin(F.broadcast(mx))
        .groupBy(
            F.expr(f"CAST(doc_id * {NOVELTY_BUCKETS} DIV n_docs AS BIGINT)")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n_grams"),
            novel.alias("n_novel"),
            F.expr(
                f"CAST(SUM(CAST(novel AS BIGINT)) * 1000000 "
                f"DIV COUNT(*) AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )
