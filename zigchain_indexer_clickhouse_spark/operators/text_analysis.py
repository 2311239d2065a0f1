"""Text-analysis operators for training-data pipelines
(SURVEY.md §2.3 #40-43): language ID, quality scoring, token counting,
document fingerprinting.

All four are pure column-expression pipelines over ``documents`` —
narrow, shuffle-free, whole-stage-codegen'd. At 100 TB they run as a
single scan per batch; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.functions.hashing import (
    rolling_fingerprint,
    rolling_fingerprint_sql,
)
from zigchain_indexer_clickhouse_spark.functions.text import (
    BPE_REGEX,
    stopword_hits,
    stopword_hits_sql,
    tokens,
)
from zigchain_indexer_clickhouse_spark.plans.registry import register

_LANGS = ("en", "es", "de", "fr", "zh")


# --------------------------------------------------------------------------
# 40. lang_id — n-gram/stopword heuristic language ID
# --------------------------------------------------------------------------
def _lang_id_oracle() -> str:
    scores = ",\n           ".join(
        f"{stopword_hits_sql('toks', lg)} AS score_{lg}" for lg in _LANGS
    )
    # first-max tie-break in fixed _LANGS order
    cases = []
    for i, lg in enumerate(_LANGS):
        conds = [f"score_{lg} > 0"] + [
            f"score_{lg} >= score_{other}" for other in _LANGS[i + 1 :]
        ] + [f"score_{lg} > score_{other}" for other in _LANGS[:i]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lg}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'unknown' END"
    return f"""
    WITH scored AS (
      SELECT doc_id, {scores}
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
    )
    SELECT doc_id, {case_sql} AS pred_lang,
           CAST(score_en AS INT) AS score_en, CAST(score_zh AS INT) AS score_zh
    FROM scored
    """


@register("lang_id", oracle=_lang_id_oracle())
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit scores per language, argmax
    with a fixed preference order for ties. Entirely builtin expressions."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), " ")
    d = d.select("doc_id", toks.alias("toks"))
    for lg in _LANGS:
        d = d.withColumn(f"score_{lg}", stopword_hits(F.col("toks"), lg))
    pred = F.lit("unknown")
    for lg in reversed(_LANGS):
        later = _LANGS[_LANGS.index(lg) + 1 :]
        earlier = _LANGS[: _LANGS.index(lg)]
        cond = F.col(f"score_{lg}") > 0
        for o in later:
            cond = cond & (F.col(f"score_{lg}") >= F.col(f"score_{o}"))
        for o in earlier:
            cond = cond & (F.col(f"score_{lg}") > F.col(f"score_{o}"))
        pred = F.when(cond, lg).otherwise(pred)
    return d.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.col("score_en").cast("int").alias("score_en"),
        F.col("score_zh").cast("int").alias("score_zh"),
    )


# --------------------------------------------------------------------------
# 41. quality_score — length/punct/stopword quality heuristics
# --------------------------------------------------------------------------
@register(
    "quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len(string_split(trim(text), ' ')) AS INT) AS n_tokens,
           ROUND(len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0
                 / length(text), 4) AS punct_ratio,
           ROUND({stopword_hits_sql("string_split(trim(text), ' ')", "en")} * 1.0
                 / len(string_split(trim(text), ' ')), 4) AS stopword_ratio,
           ROUND(least(1.0, len(string_split(trim(text), ' ')) / 100.0) * 0.5
                 + {stopword_hits_sql("string_split(trim(text), ' ')", "en")} * 1.0
                   / len(string_split(trim(text), ' ')) * 0.5, 4) AS quality
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics: length, punctuation ratio, stopword
    ratio, and a blended 0-1 quality score — the usual pre-training
    corpus filters, as pure codegen expressions."""
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_ratio = stopword_hits(toks, "en") * 1.0 / n_tokens
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        n_tokens.cast("int").alias("n_tokens"),
        F.round(F.regexp_count("text", F.lit(r"[^\w\s]")) * 1.0 / F.length("text"), 4).alias(
            "punct_ratio"
        ),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(
            F.least(F.lit(1.0), n_tokens / 100.0) * 0.5 + stop_ratio * 0.5, 4
        ).alias("quality"),
    )


# --------------------------------------------------------------------------
# 42. token_count — whitespace + BPE-ish regex token counts
# --------------------------------------------------------------------------
@register(
    "token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS INT) AS bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_calc
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish
    pre-tokenizer regex (word runs | single punctuation) — the standard
    cheap token estimator for corpus budgeting."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("int").alias("ws_tokens"),
        F.regexp_count("text", F.lit(BPE_REGEX)).cast("int").alias("bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


# --------------------------------------------------------------------------
# 43. doc_fingerprint — rolling-hash document fingerprint
# --------------------------------------------------------------------------
@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {rolling_fingerprint_sql("string_split(trim(text), ' ')")} AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint over the token stream
    (polynomial mod 2^31-1), folded with builtin `aggregate` — a cheap
    content-identity key for incremental dedup."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        rolling_fingerprint(F.split(F.trim("text"), " ")).alias("fingerprint"),
    )
