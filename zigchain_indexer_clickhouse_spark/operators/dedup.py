"""Deduplication operators for training-data pipelines
(SURVEY.md §2.3 #33-36): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Test corpus: ``documents`` unioned with deterministic synthetic
duplicates (exact copies for #33, drop-first-token near-copies for
#34-35) so each operator provably finds known positives; the DuckDB
oracle builds the identical corpus.

Scale design: every near-dup operator is candidate-generation by
EQUI-join (LSH band buckets / simhash chunks / metadata blocks), never
an all-pairs comparison — the O(n·k) shape that survives 100 TB. The
verify step joins candidate pairs back to per-doc feature sets by id,
so wide arrays never ride through the pair shuffle.
"""

from __future__ import annotations

from functools import reduce
from itertools import combinations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.functions.hashing import (
    minhash_perm,
    minhash_perm_sql,
    portable_hash,
    portable_hash_sql,
)
from zigchain_indexer_clickhouse_spark.plans.registry import register


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut an iterative DataFrame's lineage. Default: localCheckpoint
    (executor-resident — fastest, but blocks die with their executor
    and truncated lineage cannot recompute). With
    SPARK_GRAFT_CHECKPOINT_DIR set, a RELIABLE checkpoint to that
    directory instead (HDFS/object store on a real cluster): executor
    loss mid-iteration replays from storage. Output is identical either
    way — RESILIENCE.json's reliable_checkpoint entry proves it on the
    same query."""
    import os

    ckdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckdir:
        sc = df.sparkSession.sparkContext
        if not sc.getCheckpointDir():
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)

MINHASH_K = 8  # signature length
LSH_BANDS = 4  # bands of 2 rows each

# SimHash banding (Manku et al., WWW'07 block-permutation scheme, done as
# block COMBINATIONS so it's one equi-join): the 60-bit fingerprint splits
# into M=10 blocks of 6 bits; every T=4-block subset is a 24-bit candidate
# key. Pigeonhole: hamming<=6 flips touch <=6 blocks, leaving >=4 clean
# -> every qualifying pair shares >=1 key (guaranteed recall, unlike
# single-chunk banding which only guarantees hamming<=chunks-1). The
# (M, T) dial: C(M,T) key rows per doc vs key selectivity (T*6 bits) vs
# guaranteed radius (M-T).
SIMHASH_BITS = 60
SIMHASH_BLOCKS = 10
SIMHASH_BLOCK_BITS = 6
SIMHASH_KEY_BLOCKS = 4
SIMHASH_COMBOS = tuple(combinations(range(SIMHASH_BLOCKS), SIMHASH_KEY_BLOCKS))
HAMMING_MAX = 6
JACCARD_MIN = 0.4
NGRAM_JACCARD_MIN = 0.2

# Shared corpus CTE for the DuckDB oracles (exact copies / near copies).
_CORPUS_EXACT = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents
"""
_CORPUS_NEAR = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id,
         substring(text, instr(text, ' ') + 1) AS text
  FROM documents
"""


def _corpus(spark: SparkSession, sf_dir: str, near: bool) -> DataFrame:
    """documents + synthetic duplicates (near=True drops the first token
    of the copy, making a near- rather than exact duplicate)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    if near:
        copy = d.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
    else:
        copy = d.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    return d.unionAll(copy)


# --------------------------------------------------------------------------
# 33. dedup_exact — hash-groupBy exact dedup
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle=f"""
    WITH corpus AS ({_CORPUS_EXACT})
    SELECT sha256(text) AS text_hash, COUNT(*) AS n_dups,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM corpus GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: sha256(text) groupBy, keep the lowest doc_id.
    One map-side-combinable shuffle on the 32-byte hash — the canonical
    100 TB exact-dedup plan (hash first, never shuffle full texts)."""
    c = _corpus(spark, sf_dir, near=False)
    return (
        c.groupBy(F.sha2("text", 256).alias("text_hash"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# --------------------------------------------------------------------------
# 34. dedup_minhash_lsh — shingle → minhash → banded LSH → Jaccard verify
# --------------------------------------------------------------------------
def hashed_shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, bh: array<long>) hashed 3-word shingle
    SETS. One md5 per shingle, then downstream works on the hashed set —
    the wide string arrays never leave this projection. Shared by
    dedup_minhash_lsh and contamination_fuzzy (corpus_quality.py)."""
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 3)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 3),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, F.lit(3))),
        )
    )
    return toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(shingles, lambda s: portable_hash(s))
        ).alias("bh"),
    )


_STAGE_CACHE: dict[tuple, DataFrame] = {}


def _shared_stage(key_tag: str, spark: SparkSession, sf_dir: str, build) -> DataFrame:
    """Memoized persisted stage, keyed by (applicationId, sf_dir, tag).

    The near-dup family (#34 minhash, #36 ngram-jaccard, #145 composed
    clusters) all consume the same hashed-shingle candidate stage;
    without sharing, each query re-persists its own copy and — because
    operators return LAZY DataFrames, so there is no post-action point
    to unpersist from inside — the duplicates leak for the session
    (ADVICE r3). One cache entry per (app, sf_dir, tag); entries for a
    different sf_dir or a dead app are unpersisted on the way in, so
    peak footprint is one corpus's stages regardless of how many scale
    factors a session sweeps."""
    key = (spark.sparkContext.applicationId, sf_dir, key_tag)
    df = _STAGE_CACHE.get(key)
    if df is not None:
        return df
    for k in [k for k in _STAGE_CACHE if k[0] != key[0] or k[1] != sf_dir]:
        try:
            _STAGE_CACHE.pop(k).unpersist()
        except Exception:  # dead SparkContext — nothing to release
            _STAGE_CACHE.pop(k, None)
    df = build().persist()
    _STAGE_CACHE[key] = df
    return df


def shared_hashed_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one persisted copy of hashed_shingle_sets(near corpus) that
    #34 / #36 / #145 share within a session."""
    return _shared_stage(
        "hashed_shingles", spark, sf_dir,
        lambda: hashed_shingle_sets(_corpus(spark, sf_dir, near=True)),
    )


def lsh_band_rows(hashed: DataFrame) -> DataFrame:
    """(doc_id, bh) → exploded (doc_id, band_key) LSH band rows:
    k={MINHASH_K} affine minhash permutations folded into {LSH_BANDS}
    bands of 2. ~8x fewer digest evaluations than hashing per
    (shingle, seed) — the perms are cheap integer arithmetic."""

    def _minhash(j: int):
        # NB: the lambda must take exactly ONE parameter — a 2-arg lambda
        # makes F.transform pass (element, index) and the index silently
        # replaces the seed
        return F.array_min(F.transform(F.col("bh"), lambda h: minhash_perm(h, j)))

    sig_cols = [_minhash(j).alias(f"mh{j}") for j in range(MINHASH_K)]
    sigs = hashed.select("doc_id", *sig_cols)
    band_keys = F.array(
        *[
            F.concat_ws(
                ":", F.lit(b), F.col(f"mh{2 * b}").cast("string"),
                F.col(f"mh{2 * b + 1}").cast("string"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(band_keys).alias("band_key"))


def _sig_ctes() -> str:
    """The signature-prefix CTE chain: near corpus → 3-word shingles →
    portable-hashed shingle sets → minhash signature list. Shared by
    the #34/#36 candidate chain and the #219 band-tuning sweep so every
    consumer sees the identical signatures."""
    base = portable_hash_sql("shingle")
    perms = " ".join(
        f"WHEN s.j = {j} THEN {minhash_perm_sql('bh', j)}" for j in range(MINHASH_K)
    )
    return f"""
    corpus AS ({_CORPUS_NEAR}),
    tok AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM corpus),
    shd AS (
      SELECT DISTINCT doc_id,
             toks[g.i] || ' ' || toks[g.i+1] || ' ' || toks[g.i+2] AS shingle
      FROM tok, generate_series(1, 4000) g(i)
      WHERE g.i <= len(toks) - 2
    ),
    shh AS (SELECT DISTINCT doc_id, {base} AS bh FROM shd),
    sig AS (
      SELECT doc_id, s.j AS j, MIN(CASE {perms} END) AS mh
      FROM shh, generate_series(0, {MINHASH_K - 1}) s(j)
      GROUP BY doc_id, s.j
    ),
    sigl AS (SELECT doc_id, list(mh ORDER BY j) AS sig FROM sig GROUP BY doc_id)"""


def _minhash_cand_ctes() -> str:
    """The shared candidate-generation CTE chain (signature prefix +
    LSH band keys → band-bucket candidate pairs). Reused verbatim by
    the #34 oracle and the #36 (dedup_ngram_jaccard) oracle so both
    verify passes see the identical candidate space the Spark side
    builds from ``lsh_band_rows``."""
    return f"""{_sig_ctes()},
    bands AS (
      SELECT doc_id,
             CAST(b.b AS VARCHAR) || ':' || CAST(sig[2*b.b+1] AS VARCHAR)
               || ':' || CAST(sig[2*b.b+2] AS VARCHAR) AS band_key
      FROM sigl, generate_series(0, {LSH_BANDS - 1}) b(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM bands a JOIN bands c
        ON a.band_key = c.band_key AND a.doc_id < c.doc_id
    )"""


def lsh_candidate_pairs(hashed: DataFrame) -> DataFrame:
    """(doc_id, bh) hashed shingle sets → distinct (doc_a, doc_b)
    candidate pairs via the LSH band-bucket equi-join — O(n·bands)
    band rows, pairs only where a full band collides. The one and only
    candidate generator for the near-dup family (#34 verifies with
    shingle Jaccard, #36 with bigram Jaccard)."""
    bands = lsh_band_rows(hashed)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_cand_ctes()},
    nsh AS (SELECT doc_id, COUNT(*) AS n FROM shh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS ninter
      FROM cand c
      JOIN shh x ON x.doc_id = c.doc_a
      JOIN shh y ON y.doc_id = c.doc_b AND x.bh = y.bh
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT c.doc_a, c.doc_b,
             ROUND(COALESCE(i.ninter, 0) * 1.0
                   / (na.n + nb.n - COALESCE(i.ninter, 0)), 4) AS jaccard
      FROM cand c
      JOIN nsh na ON na.doc_id = c.doc_a
      JOIN nsh nb ON nb.doc_id = c.doc_b
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    ) WHERE jaccard >= {JACCARD_MIN}
    """


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup detection: 3-word shingles → k={MINHASH_K}
    portable minhash signature → {LSH_BANDS} LSH bands → band-bucket
    equi-join for candidates → exact Jaccard verify on candidate pairs.

    Scale notes: candidates come from a shuffle-hash equi-join on the
    band key (O(n·bands) rows), and the Jaccard verify re-joins shingle
    SETS by doc_id — so the pair join only carries ids. Entirely builtin
    higher-order functions; no Python in the pipeline.
    """
    hashed = shared_hashed_shingles(spark, sf_dir)
    cand = lsh_candidate_pairs(hashed)
    sh_a = hashed.select(F.col("doc_id").alias("doc_a"), F.col("bh").alias("sh_a"))
    sh_b = hashed.select(F.col("doc_id").alias("doc_b"), F.col("bh").alias("sh_b"))
    verified = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                * 1.0
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_MIN)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


# --------------------------------------------------------------------------
# 35. dedup_simhash — 32-bit simhash + chunk-banded hamming pairs
# --------------------------------------------------------------------------
def _simhash_oracle() -> str:
    h = portable_hash_sql("tok")
    powers = ", ".join(str(1 << i) for i in range(SIMHASH_BITS))
    bw, nv = SIMHASH_BLOCK_BITS, 1 << SIMHASH_BLOCK_BITS
    blk_powers = ", ".join(str(1 << (bw * b)) for b in range(SIMHASH_BLOCKS))
    combo_vals = ", ".join(
        f"({p}, {c[0]}, {c[1]}, {c[2]}, {c[3]})" for p, c in enumerate(SIMHASH_COMBOS)
    )
    kv = " + ".join(
        f"((simhash // ([{blk_powers}])[pr.i{k} + 1]) % {nv}) * {nv ** k}"
        for k in range(SIMHASH_KEY_BLOCKS)
    )
    return f"""
    WITH corpus AS ({_CORPUS_NEAR}),
    tokr AS (
      SELECT doc_id, {h} AS th
      FROM (SELECT doc_id, u.tok FROM
              (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM corpus) t,
              UNNEST(t.toks) u(tok))
    ),
    votes AS (
      SELECT doc_id, p.i AS bit,
             SUM(CASE WHEN (th // ([{powers}])[p.i + 1]) % 2 = 1
                      THEN 1 ELSE -1 END) AS vote
      FROM tokr, generate_series(0, {SIMHASH_BITS - 1}) p(i)
      GROUP BY doc_id, p.i
    ),
    sh AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote > 0 THEN ([{powers}])[bit + 1] ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    ),
    keys AS (
      SELECT doc_id, simhash, pr.p, {kv} AS kv
      FROM sh, (VALUES {combo_vals}) pr(p, i0, i1, i2, i3)
    )
    SELECT doc_a, doc_b, hamming FROM (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM keys a JOIN keys b
        ON a.p = b.p AND a.kv = b.kv AND a.doc_id < b.doc_id
    ) WHERE hamming <= {HAMMING_MAX}
    """


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: per-token portable hash votes on 60 bits →
    fingerprint; candidates from the Manku block-combination bands (see
    SIMHASH_COMBOS — 24-bit keys, guaranteed recall at hamming≤6);
    verify with bit_count(xor). Bit tests use div/mod arithmetic so the
    oracle replays identically.

    Pair-dedup is a FILTER, not distinct(): a qualifying pair matches in
    possibly many of the 210 bands, but both fingerprints ride through
    the join, so each row can recompute the full match vector and keep
    itself only in the FIRST matching band — no extra shuffle of the
    candidate set (same trick as dedup_minhash_lsh's first-shared-bucket
    filter)."""
    bw, nv = SIMHASH_BLOCK_BITS, 1 << SIMHASH_BLOCK_BITS
    c = _corpus(spark, sf_dir, near=True)
    tokr = c.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    ).select("doc_id", portable_hash(F.col("tok")).alias("th"))
    # All 60 bit votes in ONE per-doc aggregation of 60 conditional
    # sums — NOT an explode to (doc, bit) rows, which would push
    # tokens×60 rows through the shuffle. Partial aggregation collapses
    # each map partition to 60 counters per doc, so the exchange
    # carries one row per doc. Bit tests use integer `div` by an exact
    # power-of-two literal — a double division would corrupt low bits
    # of the 60-bit hash.
    vote_cols = [
        F.sum(
            F.when(F.expr(f"(th div {1 << j}) % 2 = 1"), 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = tokr.groupBy("doc_id").agg(*vote_cols)
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    sh = votes.select("doc_id", fp.cast("long").alias("simhash"))

    # Band keys from a constant-folded literal of the 210 combos — one
    # small arithmetic expression per row, NOT 210 inlined struct
    # builders (a ~1000-node tree blows the codegen method limit and
    # falls back to interpreted eval).
    combos_sql = "array(" + ", ".join(
        "array(" + ", ".join(str(blk) for blk in combo) + ")"
        for combo in SIMHASH_COMBOS
    ) + ")"
    kv_sql = " + ".join(
        f"((simhash div cast(pow(2, c[{k}] * {bw}) as bigint)) % {nv}) * {nv ** k}"
        for k in range(SIMHASH_KEY_BLOCKS)
    )
    keys = (
        sh.select("doc_id", "simhash", F.posexplode(F.expr(combos_sql)).alias("p", "c"))
        .withColumn("kv", F.expr(kv_sql))
    )

    a, b = keys.alias("a"), keys.alias("b")
    cand = a.join(
        b,
        (F.col("a.p") == F.col("b.p"))
        & (F.col("a.kv") == F.col("b.kv"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.c").alias("c"),
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash")).alias("x"),
    )
    # Pair-dedup filter: a clean block has a zero xor block. Combos are
    # generated in lexicographic order, so the FIRST all-clean band is
    # exactly the 4 smallest clean block indices — keep the pair only in
    # that band.
    first_band = F.expr(
        f"slice(filter(sequence(0, {SIMHASH_BLOCKS - 1}),"
        f"             blk -> (x div cast(pow(2, blk * {bw}) as bigint)) % {nv} = 0),"
        f"       1, {SIMHASH_KEY_BLOCKS})"
    )
    return (
        cand.filter(first_band == F.col("c"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count("x").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
    )


# --------------------------------------------------------------------------
# 36. dedup_ngram_jaccard — n-gram Jaccard verify over LSH candidates
# --------------------------------------------------------------------------
def _ngram_jaccard_oracle() -> str:
    bgh = portable_hash_sql("bigram")
    return f"""
    WITH {_minhash_cand_ctes()},
    bgd AS (
      SELECT DISTINCT doc_id, toks[g.i] || ' ' || toks[g.i+1] AS bigram
      FROM tok, generate_series(1, 4000) g(i)
      WHERE g.i <= len(toks) - 1
    ),
    bg AS (SELECT DISTINCT doc_id, {bgh} AS bh2 FROM bgd),
    nbg AS (SELECT doc_id, COUNT(*) AS n FROM bg GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS ninter
      FROM cand c
      JOIN bg x ON x.doc_id = c.doc_a
      JOIN bg y ON y.doc_id = c.doc_b AND x.bh2 = y.bh2
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT c.doc_a, c.doc_b,
             ROUND(COALESCE(i.ninter, 0) * 1.0
                   / (na.n + nb.n - COALESCE(i.ninter, 0)), 4) AS jaccard
      FROM cand c
      JOIN nbg na ON na.doc_id = c.doc_a
      JOIN nbg nb ON nb.doc_id = c.doc_b
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    ) WHERE jaccard >= {NGRAM_JACCARD_MIN}
    """


@register("dedup_ngram_jaccard", oracle=_ngram_jaccard_oracle())
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard verify pass over LSH band candidates — the
    cheap second-stage check a corpus pipeline runs downstream of
    MinHash LSH, scoring with a FINER feature set (word bigrams) than
    the 3-word shingles that generated the candidates.

    Candidates come from ``lsh_candidate_pairs`` — the same band-bucket
    equi-join `dedup_minhash_lsh` uses, O(n·bands) band rows and pairs
    only on full-band collisions — NOT from metadata blocking: a
    (lang, source) self-join is O(block²), and at corpus scale a single
    (en, web) block IS the corpus (VERDICT r2 "What's wrong" #1). The
    verify join carries only ids + hashed bigram sets, never text."""
    c = _corpus(spark, sf_dir, near=True)
    hashed = shared_hashed_shingles(spark, sf_dir)
    cand = lsh_candidate_pairs(hashed)
    toks = c.select(
        "doc_id", F.split(F.trim("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 2)
    bigrams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 2),
            lambda i: portable_hash(
                F.concat_ws(" ", F.slice(F.col("toks"), i + 1, F.lit(2)))
            ),
        )
    )
    bg = _shared_stage(
        "bigram_sets", spark, sf_dir,
        lambda: toks.select("doc_id", bigrams.alias("bg")),
    )
    bg_a = bg.select(F.col("doc_id").alias("doc_a"), F.col("bg").alias("bg_a"))
    bg_b = bg.select(F.col("doc_id").alias("doc_b"), F.col("bg").alias("bg_b"))
    return (
        cand.join(bg_a, "doc_a")
        .join(bg_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("bg_a", "bg_b"))
                * 1.0
                / F.size(F.array_union("bg_a", "bg_b")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= NGRAM_JACCARD_MIN)
    )


# --------------------------------------------------------------------------
# 102. dedup_exact_substring — shared K-token-window dedup (Lee et al. 2021)
# --------------------------------------------------------------------------
EXSUB_K = 8  # tokens per window (paper uses 50-token runs at corpus scale)
EXSUB_MAX_DF = 8  # stop-window cap: windows in more docs are boilerplate


def _exsub_oracle() -> str:
    wh = portable_hash_sql(f"array_to_string(toks[g.i : g.i + {EXSUB_K - 1}], ' ')")
    return f"""
    WITH corpus AS ({_CORPUS_NEAR}),
    tok AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM corpus),
    win AS (
      SELECT DISTINCT doc_id, {wh} AS wh
      FROM tok, generate_series(1, 4000) g(i)
      WHERE g.i <= len(toks) - {EXSUB_K - 1}
    ),
    grp AS (
      SELECT wh FROM win GROUP BY wh
      HAVING COUNT(*) BETWEEN 2 AND {EXSUB_MAX_DF}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS shared_windows
    FROM grp g
    JOIN win a ON a.wh = g.wh
    JOIN win b ON b.wh = g.wh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """


@register("dedup_exact_substring", oracle=_exsub_oracle())
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): two docs are duplicates when
    they share any run of {EXSUB_K} consecutive tokens. The paper's
    suffix array is a single-machine structure; the distributed
    re-expression is sliding-window hashing — every K-token window,
    hashed, is a join key, and a shared window IS a shared substring.

    Scale shape: ONE groupBy on the 8-byte window hash (texts never
    shuffle), then pair expansion happens in expression land from the
    grouped doc-id array — no self-join of the (doc, window) table, so
    the candidate stage is one shuffle instead of a two-sided join of
    the biggest intermediate. The df cap (≤{EXSUB_MAX_DF} docs/window)
    is the standard stop-window guard: without it one boilerplate
    header shared by 1M docs emits 10^12 pairs; with it, pair count is
    ≤ C(cap,2)·windows. The cap is also applied in the oracle, so both
    engines see the identical candidate space."""
    c = _corpus(spark, sf_dir, near=True)
    docs = c.select("doc_id", F.split(F.trim("text"), " ").alias("toks")).filter(
        F.size("toks") >= EXSUB_K
    )
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - EXSUB_K),
            lambda i: portable_hash(
                F.concat_ws(" ", F.slice(F.col("toks"), i + 1, F.lit(EXSUB_K)))
            ),
        )
    )
    wh = docs.select("doc_id", F.explode(wins).alias("wh"))
    grouped = (
        wh.groupBy("wh")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= EXSUB_MAX_DF))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(ds) - 2),"
                " i -> transform(sequence(i + 1, size(ds) - 1),"
                " j -> struct(ds[i] AS doc_a, ds[j] AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count("*").alias("shared_windows")
    )


# --------------------------------------------------------------------------
# 94. dedup_clusters — connected components over duplicate pairs
# --------------------------------------------------------------------------
_CLUSTER_EDGES_SQL = """
      SELECT doc_id AS a, doc_id + 10000 AS b FROM documents
      UNION ALL
      SELECT doc_id, doc_id + 20000 FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, doc_id + 1 FROM documents
      WHERE doc_id % 50 = 0
        AND doc_id + 1 IN (SELECT doc_id FROM documents)
"""


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE base AS ({_CLUSTER_EDGES_SQL}),
    edges AS (
      SELECT a, b FROM base UNION SELECT b, a FROM base
    ),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach AS (
      SELECT n AS src, n AS dst FROM nodes
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT CAST(src AS BIGINT) AS doc_id,
           CAST(MIN(dst) AS BIGINT) AS cluster_id
    FROM reach GROUP BY src
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the duplicate-pair graph — the step
    after pair generation in every corpus dedup pipeline: transitive
    duplicates (A~B, B~C) must land in ONE cluster so a single
    canonical doc (the min id) survives. The reference's
    ReplacingMergeTree only dedups exact keys; component-forming is the
    generalization near-dup pipelines need.

    Spark-first iterative algorithm: min-label propagation. Each
    round, every node takes the min label over itself and its
    neighbors (one join + one groupBy, both hash-partitioned on the
    node id); converges in O(diameter) rounds — the synthetic edge set
    has diameter ≤ 3, real near-dup graphs rarely exceed ~20 (the
    iteration cap). Convergence is detected by an aggregate checksum,
    not a row-by-row diff. The oracle computes the same components
    with a recursive-CTE transitive closure — an independent
    formulation, so the propagation loop is cross-checked end to end.
    """
    d = load(spark, sf_dir, "documents").select("doc_id")
    e1 = d.select(F.col("doc_id").alias("a"), (F.col("doc_id") + 10000).alias("b"))
    e2 = d.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("a"), (F.col("doc_id") + 20000).alias("b")
    )
    nxt = d.select((F.col("doc_id")).alias("nd"))
    e3 = (
        d.filter(F.col("doc_id") % 50 == 0)
        .join(nxt, F.col("doc_id") + 1 == F.col("nd"))
        .select(F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b"))
    )
    base = e1.unionAll(e2).unionAll(e3)
    labels = propagate_components(base)
    return labels.select(
        F.col("n").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("cluster_id"),
    )


def propagate_components(
    base: DataFrame, nodes: DataFrame | None = None
) -> DataFrame:
    """Connected components over an undirected edge set ``base``
    (columns a, b) → (n, label) where label = the component's min node
    id. ``nodes`` optionally adds isolated vertices (they keep their
    own id as label — singleton clusters). Shared by dedup_clusters
    (#94, synthetic edges) and near_dup_clusters (#145, real MinHash
    pairs).

    Algorithm: alternating large-star / small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — a public map-reduce algorithm). Each half-round is one
    min-agg + one co-partitioned join on the node id; the edge set
    contracts toward a star forest rooted at each component's min in
    O(log² n) rounds WORST CASE and ~log(diameter)-ish in practice —
    unlike plain min-label propagation, whose O(diameter) round count
    grew 10.6× on the 10× replica-chain scale probe (chains make
    diameter proportional to dup-group size). The edge count never
    grows: each round re-points existing edges, so peak shuffle volume
    is bounded by the input pair count.

    Convergence: a star forest is a fixpoint of both stars; detected
    by an (edge-count, hash-sum) checksum going stable. The min-label
    reference implementation is kept as `_propagate_minlabel` and the
    two are cross-checked (plus a union-find ground truth and a
    beyond-old-round-cap chain) in tests/test_components.py."""
    # canonical child→parent orientation (parent < child). Self-loops
    # stay in the persisted set (they carry node identity for the
    # final labeling) but are filtered out of the contraction loop.
    # Persisted once: the upstream pair pipeline is read exactly one
    # time regardless of round count.
    canon = (
        base.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
        .persist()
    )
    edges = canon.filter(F.col("a") != F.col("b"))

    prev_key, cached = None, edges
    # O(log² n) bound; breaks at the star-forest fixpoint (real dup
    # graphs converge in <10 rounds — extra headroom costs nothing)
    for _ in range(40):
        cur = cached
        # ---- large-star: center u over its FULL neighborhood Γ(u);
        # m = min(Γ(u) ∪ {u}); re-point every neighbor v > u to m.
        # With child→parent rows, Γ needs both orientations.
        sym = cur.select(
            F.col("a").alias("c"), F.col("b").alias("n")
        ).unionAll(cur.select(F.col("b").alias("c"), F.col("a").alias("n")))
        mins = (
            sym.groupBy("c")
            .agg(F.min("n").alias("mn"))
            .select("c", F.least("c", "mn").alias("m"))
        )
        large = (
            sym.join(mins, "c")
            .filter(F.col("n") > F.col("c"))
            .select(F.col("n").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .persist()  # two consumers below (min-agg + parent join)
        )
        # ---- small-star: center u over its SMALLER neighbors P(u)
        # (with downward edges that's exactly u's parent rows);
        # m = min(P); re-point u and every p ∈ P to m.
        mins2 = large.groupBy("a").agg(F.min("b").alias("m"))
        e_child = mins2.select("a", F.col("m").alias("b"))
        e_par = (
            large.join(mins2, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        nxt = (
            e_child.unionAll(e_par)
            .filter(F.col("a") != F.col("b"))
            .distinct()
            # lineage TRUNCATION, not just caching: each round's plan
            # references the previous round's ~6×, so without a
            # checkpoint the logical plan grows exponentially and the
            # driver OOMs analyzing it by round ~8 (the standard
            # iterative-DataFrame failure mode; GraphFrames does the
            # same). Default localCheckpoint keeps the data on
            # executors (fast, but an executor loss mid-iteration is
            # unrecoverable — the truncated lineage can't recompute);
            # set SPARK_GRAFT_CHECKPOINT_DIR for the cluster-grade
            # reliable checkpoint (same results, RESILIENCE.json
            # reliable_checkpoint entry).
            .transform(_truncate_lineage)
        )
        # convergence checksum — one count + one hash-sum in a single
        # job over the checkpointed rows
        row = nxt.agg(
            F.count("*").alias("c"),
            F.sum(F.hash("a", "b").cast("long")).alias("h"),
        ).collect()[0]
        key = (row["c"], row["h"])
        large.unpersist()
        # nxt is already materialized (eager), so dropping the previous
        # round's checkpoint cannot trigger an impossible recompute
        if cached is not edges:
            cached.unpersist()
        cached = nxt
        if key == prev_key:
            break
        prev_key = key

    # star forest → labels: non-roots read their parent, roots and
    # isolated nodes label themselves. Node universe comes from the
    # canonical set WITH self-loops, so self-loop-only nodes still
    # surface as singletons — the minlabel contract.
    all_nodes = canon.select(F.col("a").alias("n")).unionAll(
        canon.select(F.col("b").alias("n"))
    )
    if nodes is not None:
        all_nodes = all_nodes.unionAll(nodes.select("n"))
    all_nodes = all_nodes.distinct()
    final = cached.select(
        F.col("a").alias("n"), F.col("b").alias("label")
    )
    labels = (
        all_nodes.join(final, "n", "left")
        .select("n", F.coalesce("label", "n").alias("label"))
        .persist()
    )
    labels.count()  # materialize before the edge input unpersists
    canon.unpersist()
    # the last checkpoint stays persisted: labels' cache may need it on
    # eviction, and a truncated-lineage RDD cannot be recomputed
    return labels


def _propagate_minlabel(
    base: DataFrame, nodes: DataFrame | None = None
) -> DataFrame:
    """Reference implementation: plain min-label propagation,
    O(diameter) rounds of join+groupBy. Kept as the independent
    cross-check for the star-contraction path (same output contract);
    not used by any registered operator."""
    edges = base.unionAll(
        base.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()

    labels = edges.select(F.col("a").alias("n")).distinct()
    if nodes is not None:
        labels = labels.unionAll(nodes.select(F.col("n"))).distinct()
    labels = labels.select("n", F.col("n").alias("label"))
    prev_sum, cached = None, None
    for _ in range(20):  # diameter cap; each round is 2 shuffles
        # persist BEFORE the convergence collect: the checksum job then
        # POPULATES the cache, so next round reuses this round's
        # join+agg instead of recomputing it
        neighbor_min = (
            edges.join(labels, edges.a == labels.n)
            .select(F.col("b").alias("n"), "label")
            .unionAll(labels)
            .groupBy("n")
            .agg(F.min("label").alias("label"))
        ).persist()
        # convergence: sum of labels is strictly decreasing until fixed
        cur_sum = neighbor_min.agg(F.sum("label")).collect()[0][0]
        labels = neighbor_min
        if cached is not None:
            cached.unpersist()  # only the frontier stays cached
        cached = labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels


# --------------------------------------------------------------------------
# 145. near_dup_clusters — the composed near-dup pipeline, end to end
# --------------------------------------------------------------------------
def _near_dup_clusters_oracle() -> str:
    # the verified-pair pipeline (#34's oracle) nested as the edge
    # source of the recursive component closure (#94's oracle shape),
    # with every corpus doc as a (possibly singleton) node
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_minhash_oracle()})
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (
      SELECT doc_id AS n FROM ({_CORPUS_NEAR})
    ),
    reach AS (
      SELECT n AS src, n AS dst FROM nodes
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    comp AS (
      SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS INT)
             AS is_keeper
    FROM comp
    """


@register("near_dup_clusters", oracle=_near_dup_clusters_oracle())
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED near-dup pipeline — what a corpus build actually
    runs: shingle → MinHash → LSH bands → Jaccard-verified pairs
    (#34), connected components over those pairs (#94's propagation),
    singleton clusters for untouched docs, and the keep/drop decision
    (keeper = min doc_id of the cluster). One operator = the whole
    near-dedup stage's output contract: every doc labeled, exactly one
    keeper per cluster.

    Scale story is the sum of its parts, all equi-join/agg: candidates
    from band buckets (never all pairs), verification on candidate
    pairs only, components in O(diameter) label-propagation rounds
    with per-round scalar collects. The oracle nests #34's pair SQL
    inside #94's recursive closure — an independent end-to-end
    cross-check of the composition."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    corpus_nodes = _corpus(spark, sf_dir, near=True).select(
        F.col("doc_id").alias("n")
    )
    labels = propagate_components(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
        nodes=corpus_nodes,
    )
    return labels.select(
        F.col("n").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("cluster_id"),
        (F.col("n") == F.col("label")).cast("int").alias("is_keeper"),
    )


# --------------------------------------------------------------------------
# 175. dedup_keep_best — quality-aware canonical selection per cluster
# --------------------------------------------------------------------------
def _keep_best_oracle() -> str:
    from zigchain_indexer_clickhouse_spark.functions.text import (
        stopword_hits_sql,
    )

    toks = "string_split(trim(text), ' ')"
    return f"""
    WITH ndc AS ({_near_dup_clusters_oracle()}),
    q AS (
      SELECT doc_id,
             LEAST(len({toks}), 100) * 5
               + ({stopword_hits_sql(toks, "en")} * 500) // len({toks})
               AS q_m
      FROM ({_CORPUS_NEAR})
    ),
    j AS (
      SELECT ndc.cluster_id, ndc.doc_id, q.q_m,
             ROW_NUMBER() OVER (PARTITION BY ndc.cluster_id
                                ORDER BY q.q_m DESC, ndc.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY ndc.cluster_id) AS n_members
      FROM ndc JOIN q USING (doc_id)
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(doc_id AS BIGINT) AS keep_id,
           CAST(q_m AS BIGINT) AS keep_q_m,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_members - 1 AS BIGINT) AS n_dropped
    FROM j WHERE rn = 1
    """


@register("dedup_keep_best", oracle=_keep_best_oracle())
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection — the step most dedup
    pipelines get wrong: after clustering near-duplicates (#145), keep
    the HIGHEST-QUALITY member of each cluster, not the arbitrary min
    id (web crawls routinely carry a clean original next to a mangled
    scrape; min-id keeps whichever was crawled first). Quality is an
    integer milli-score — min(tokens,100)*5 + stopword-share*500 — so
    the per-cluster argmax is exact on both engines (the q2/q15 rule:
    anything that feeds an ORDERING or EQUALITY is integer, never a
    rounded float).

    Plan: reuses #145's composed pipeline (shared persisted minhash
    stage, band-bucket candidates, star-contraction components) as-is,
    joins the per-doc score (pure expression scan), and picks per
    cluster with one row_number window — the join and the window both
    key on the cluster-bearing side. Output is one row per cluster:
    the survivor, its score, and how many near-dups it absorbed."""
    from zigchain_indexer_clickhouse_spark.functions.text import (
        stopword_hits,
        tokens,
    )

    labels = near_dup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    # score the SAME corpus the clusters were formed over (documents +
    # synthetic near-copies) — scoring the raw table would silently
    # drop the copies from their clusters at the join
    d = _corpus(spark, sf_dir, near=True)
    toks = tokens(F.col("text"))
    q = d.select(
        "doc_id",
        F.size(toks).alias("nt"),
        stopword_hits(toks, "en").alias("sh"),
    ).select(
        "doc_id",
        (
            F.least(F.col("nt"), F.lit(100)) * 5
            + F.expr("(sh * 500) div nt")
        ).alias("q_m"),
    )
    j = labels.join(q, "doc_id")
    wq = Window.partitionBy("cluster_id").orderBy(
        F.col("q_m").desc(), "doc_id"
    )
    wc = Window.partitionBy("cluster_id")
    return (
        j.withColumn("rn", F.row_number().over(wq))
        .withColumn("n_members", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select(
            F.col("cluster_id").cast("long"),
            F.col("doc_id").cast("long").alias("keep_id"),
            F.col("q_m").cast("long").alias("keep_q_m"),
            F.col("n_members").cast("long"),
            (F.col("n_members") - 1).cast("long").alias("n_dropped"),
        )
    )


# --------------------------------------------------------------------------
# 186. dup_graph_triangles — triangle census of the near-dup pair graph
# --------------------------------------------------------------------------
def _triangles_oracle() -> str:
    return f"""
    WITH pairs AS MATERIALIZED (
      -- MATERIALIZED: this CTE is referenced four times and DuckDB
      -- inlines CTEs by default — re-evaluating the whole minhash
      -- signature pipeline per reference spilled >50 GB at the r11
      -- sf1.0 sweep scale
      SELECT doc_a AS a, doc_b AS b FROM ({_minhash_oracle()})
    ),
    nodes AS (
      SELECT a AS n FROM pairs UNION SELECT b FROM pairs
    ),
    tri AS (
      SELECT COUNT(*) AS t
      FROM pairs e1
      JOIN pairs e2 ON e2.a = e1.b
      JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST(t AS BIGINT) AS n_triangles,
           CAST(CASE WHEN (SELECT COUNT(*) FROM pairs) = 0 THEN 0
                     ELSE t * 1000000 // (SELECT COUNT(*) FROM pairs)
                END AS BIGINT) AS triangles_per_medge
    FROM tri
    """


@register("dup_graph_triangles", oracle=_triangles_oracle())
def dup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-duplicate pair graph — the cohesion
    diagnostic for a dedup run: verified pairs forming many triangles
    mean tight genuine duplicate groups; a pair set with few triangles
    means the LSH bands are stitching unrelated docs (exactly the
    failure a band-threshold regression produces), so
    triangles-per-edge is the one number to alarm on.

    The distributed triangle pattern (Suri & Vassilvitskii's MR
    classic): every edge is already stored once in canonical a<b
    orientation, so wedges enumerate as e1(a,b)⋈e2(b,c) on the middle
    vertex and close against the edge set on (a,c) — two equi-joins,
    both keyed on bounded ids, no orientation pass needed because the
    candidate pairs are born canonical. Wedge fan-out is Σ deg², which
    the LSH band-bucket cap already bounds upstream (the same cap that
    bounds the pair join itself)."""
    pairs = (
        dedup_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    e1 = pairs
    e2 = pairs.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = pairs.select(F.col("a"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["a", "c"]).agg(
        F.count("*").alias("t")
    )
    nodes = (
        pairs.select(F.col("a").alias("n"))
        .unionAll(pairs.select(F.col("b").alias("n")))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    edges = pairs.agg(F.count("*").alias("n_edges"))
    return (
        nodes.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(tri))
        .select(
            F.col("n_nodes").cast("long"),
            F.col("n_edges").cast("long"),
            F.col("t").cast("long").alias("n_triangles"),
            F.when(F.col("n_edges") == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("(t * 1000000) div n_edges"))
            .alias("triangles_per_medge"),
        )
    )


# --------------------------------------------------------------------------
# 195. prefix_filter_join — exact similarity join via prefix filtering
# --------------------------------------------------------------------------
PF_JACCARD_MIN_PPM = 700_000  # Jaccard >= 0.7


def _prefix_filter_oracle() -> str:
    base = portable_hash_sql("shingle")
    return f"""
    WITH corpus AS ({_CORPUS_NEAR}),
    tok AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM corpus),
    shd AS (
      SELECT DISTINCT doc_id,
             toks[g.i] || ' ' || toks[g.i+1] || ' ' || toks[g.i+2] AS shingle
      FROM tok, generate_series(1, 4000) g(i)
      WHERE g.i <= len(toks) - 2
    ),
    -- NOT materialized, deliberately (VERDICT r11 next #4 candidate,
    -- measured and REJECTED): `shh AS MATERIALIZED` is 3x SLOWER at
    -- sf1.0 (302.7 s vs 105.4 s, identical 1,052,400-row result) —
    -- DuckDB parallelizes the inlined tokenize→shingle→hash pipeline
    -- into each consumer better than it scans the materialized
    -- intermediate, so re-inlining is not this oracle's bottleneck.
    shh AS (SELECT DISTINCT doc_id, {base} AS bh FROM shd),
    nsh AS (SELECT doc_id, COUNT(*) AS n FROM shh GROUP BY doc_id),
    inter AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS ninter
      FROM shh x JOIN shh y ON x.bh = y.bh AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, jac_ppm FROM (
      SELECT i.doc_a, i.doc_b,
             CAST(i.ninter * 1000000 // (na.n + nb.n - i.ninter) AS BIGINT)
               AS jac_ppm
      FROM inter i
      JOIN nsh na ON na.doc_id = i.doc_a
      JOIN nsh nb ON nb.doc_id = i.doc_b
    ) WHERE jac_ppm >= {PF_JACCARD_MIN_PPM}
    """


@register("prefix_filter_join", oracle=_prefix_filter_oracle())
def prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the
    AllPairs/PPJoin family, Bayardo et al. 2007 / Xiao et al. 2008) —
    the deterministic complement to MinHash LSH: every pair with
    shingle Jaccard >= {PF_JACCARD_MIN_PPM}/1e6 is found, guaranteed,
    with NO probabilistic recall gap. Order each doc's shingles by
    ascending global document frequency (rarest first); for threshold
    t a pair can only qualify if it shares a shingle inside each
    side's first |x| - ceil(t*|x|) + 1 shingles — so candidates come
    from an equi-join on PREFIX shingles only. Rare-first ordering
    makes the filter self-limiting: prefixes hold precisely the
    lowest-df shingles, so candidate fan-out Σ df_prefix² stays small
    even where total df is boilerplate-sized.

    The oracle is deliberately the BRUTE-FORCE similarity join (every
    pair sharing ANY shingle, exact Jaccard) — a completeness proof:
    if prefix filtering ever missed a qualifying pair, the hash
    compare fails. Verification re-joins hashed shingle SETS by id
    (array_intersect in expression land); integer-ppm Jaccard feeds
    the threshold, per the ordering-compare rule."""
    t = PF_JACCARD_MIN_PPM / 1_000_000
    hashed = shared_hashed_shingles(spark, sf_dir)
    sh = hashed.select("doc_id", F.size("bh").alias("n"),
                       F.explode("bh").alias("h"))
    dfc = sh.groupBy("h").agg(F.count("*").alias("df"))
    wd = Window.partitionBy("doc_id").orderBy("df", "h")
    prefix = (
        sh.join(dfc, "h")
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.col("n") * t) + 1)
        .select("doc_id", "h")
    )
    a = prefix.select(F.col("doc_id").alias("doc_a"), "h")
    b = prefix.select(F.col("doc_id").alias("doc_b"), "h")
    cand = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = hashed.select(F.col("doc_id").alias("doc_a"), F.col("bh").alias("sa"))
    sb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("bh").alias("sb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.expr(
                "CAST(size(array_intersect(sa, sb)) * 1000000 "
                "DIV size(array_union(sa, sb)) AS BIGINT)"
            ).alias("jac_ppm"),
        )
        .filter(F.col("jac_ppm") >= PF_JACCARD_MIN_PPM)
    )


# --------------------------------------------------------------------------
# 196. pagerank_dupgraph — integer-exact PageRank over the near-dup graph
# --------------------------------------------------------------------------
PR_ITERS = 5
PR_DAMP_PPM = 850_000  # damping 0.85 in ppm
PR_BASE_PPM = 150_000  # (1 - damping) in ppm


def _pagerank_oracle() -> str:
    prev, ctes = "r0", []
    for k in range(1, PR_ITERS + 1):
        ctes.append(f"""
    r{k} AS (
      SELECT e.dst AS n,
             CAST({PR_BASE_PPM} + {PR_DAMP_PPM}
                  * SUM(p.r // deg.d) // 1000000 AS BIGINT) AS r
      FROM edges e
      JOIN {prev} p ON p.n = e.src
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    )""")
        prev = f"r{k}"
    chain = ",".join(ctes)
    return f"""
    WITH pairs AS MATERIALIZED (
      -- MATERIALIZED: see dup_graph_triangles — the inlined minhash
      -- pipeline re-evaluates per reference otherwise
      SELECT doc_a AS a, doc_b AS b FROM ({_minhash_oracle()})
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL SELECT b, a FROM pairs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges
            GROUP BY src),
    r0 AS (SELECT src AS n, CAST(1000000 AS BIGINT) AS r FROM deg),
    {chain}
    SELECT p.n AS doc_id, deg.d AS degree, p.r AS rank_ppm
    FROM {prev} p JOIN deg ON deg.src = p.n
    """


@register("pagerank_dupgraph", oracle=_pagerank_oracle())
def pagerank_dupgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the verified near-duplicate pair graph — the
    third iterative algorithm in the engine (alongside Lloyd k-means
    and large/small-star connected components): {PR_ITERS} damped
    power iterations ranking each document by how centrally it sits in
    the duplication structure. High-rank docs are the corpus's
    template hubs — the ones to inspect before trusting any dedup
    keep-rule; the rank ordering is also the natural priority for
    manual curation review.

    Exactness discipline for an ITERATIVE float algorithm: ranks are
    held in integer ppm and every update is integer arithmetic —
    r' = {PR_BASE_PPM} + {PR_DAMP_PPM}·Σ(r_u div deg_u) div 1e6 — so
    summation order cannot perturb low bits and five chained
    iterations stay bit-identical across engines and layouts (the
    oracle unrolls the same recurrence as {PR_ITERS} CTE levels).
    Every node in the pair graph has degree >= 1, so there is no
    dangling-mass correction to model. (Intermediate product bound:
    {PR_DAMP_PPM}·Σ ≤ damp·n·max_rank — rescale to per-billion ranks
    beyond ~10^6-node components.)

    Scale shape: per iteration ONE equi-join of the rank frame to the
    persisted (src, dst, deg) edge list + one map-side-combinable
    dst-keyed sum — the standard distributed PageRank step; the edge
    list persists once (shared stage) and its fan-out is already
    bounded by the LSH band-bucket cap upstream."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )

    def _build_edges() -> DataFrame:
        edges = pairs.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionAll(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        deg = edges.groupBy("src").agg(F.count("*").alias("d"))
        return edges.join(deg, "src").select("src", "dst", "d")

    edges_d = _shared_stage("pagerank_edges", spark, sf_dir, _build_edges)
    ranks = edges_d.select("src").distinct().select(
        F.col("src").alias("n"), F.lit(1_000_000).cast("long").alias("r")
    )
    for _ in range(PR_ITERS):
        ranks = (
            edges_d.join(ranks, edges_d["src"] == ranks["n"])
            .groupBy("dst")
            .agg(F.sum(F.expr("r div d")).alias("s"))
            .select(
                F.col("dst").alias("n"),
                (
                    F.lit(PR_BASE_PPM)
                    + F.expr(f"({PR_DAMP_PPM} * s) div 1000000")
                ).cast("long").alias("r"),
            )
        )
    deg = edges_d.select("src", "d").distinct()
    return ranks.join(deg, ranks["n"] == deg["src"]).select(
        F.col("n").alias("doc_id"),
        F.col("d").cast("long").alias("degree"),
        F.col("r").alias("rank_ppm"),
    )


# --------------------------------------------------------------------------
# 200. dedup_incremental — dedup an incoming batch AGAINST an existing
#      corpus index, one-directionally (the daily-ingest workflow)
# --------------------------------------------------------------------------
def _incremental_oracle() -> str:
    base = portable_hash_sql("shingle")
    perms = " ".join(
        f"WHEN s.j = {j} THEN {minhash_perm_sql('bh', j)}"
        for j in range(MINHASH_K)
    )
    return f"""
    WITH idx AS (SELECT doc_id, text FROM documents),
    batch AS (
      SELECT doc_id + 10000 AS doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN substring(text, instr(text, ' ') + 1)
                  ELSE translate(text, 'aeiou', '01234') END AS text
      FROM documents),
    allc AS (SELECT 'i' AS side, doc_id, text FROM idx
             UNION ALL SELECT 'n', doc_id, text FROM batch),
    tok AS (SELECT side, doc_id, string_split(trim(text), ' ') AS toks
            FROM allc),
    shd AS (
      SELECT DISTINCT side, doc_id,
             toks[g.i] || ' ' || toks[g.i+1] || ' ' || toks[g.i+2] AS shingle
      FROM tok, generate_series(1, 4000) g(i)
      WHERE g.i <= len(toks) - 2),
    shh AS (SELECT DISTINCT side, doc_id, {base} AS bh FROM shd),
    sig AS (
      SELECT side, doc_id, s.j AS j, MIN(CASE {perms} END) AS mh
      FROM shh, generate_series(0, {MINHASH_K - 1}) s(j)
      GROUP BY 1, 2, 3),
    sigl AS (SELECT side, doc_id, list(mh ORDER BY j) AS sig
             FROM sig GROUP BY 1, 2),
    bands AS (
      SELECT side, doc_id,
             CAST(b.b AS VARCHAR) || ':' || CAST(sig[2*b.b+1] AS VARCHAR)
               || ':' || CAST(sig[2*b.b+2] AS VARCHAR) AS band_key
      FROM sigl, generate_series(0, {LSH_BANDS - 1}) b(b)),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS idx_id
      FROM bands n JOIN bands i ON n.band_key = i.band_key
      WHERE n.side = 'n' AND i.side = 'i'),
    nsh AS (SELECT side, doc_id, COUNT(*) AS n FROM shh GROUP BY 1, 2),
    inter AS (
      SELECT c.new_id, c.idx_id, COUNT(*) AS ninter
      FROM cand c
      JOIN shh a ON a.side = 'n' AND a.doc_id = c.new_id
      JOIN shh b ON b.side = 'i' AND b.doc_id = c.idx_id AND b.bh = a.bh
      GROUP BY 1, 2),
    ver AS (
      SELECT i.new_id, i.idx_id,
             CAST((i.ninter * 1000000) // (na.n + nb.n - i.ninter)
                  AS BIGINT) AS j_ppm
      FROM inter i
      JOIN nsh na ON na.side = 'n' AND na.doc_id = i.new_id
      JOIN nsh nb ON nb.side = 'i' AND nb.doc_id = i.idx_id
      WHERE (i.ninter * 1000000) // (na.n + nb.n - i.ninter)
            >= {INCR_J_PPM_MIN}),
    best AS (SELECT new_id, MAX(j_ppm) AS best_j_ppm,
                    COUNT(*) AS n_matches
             FROM ver GROUP BY 1)
    SELECT b.new_id AS batch_doc_id,
           CAST(b.best_j_ppm AS BIGINT) AS best_j_ppm,
           CAST(MIN(v.idx_id) AS BIGINT) AS dup_of,
           CAST(b.n_matches AS BIGINT) AS n_matches
    FROM best b
    JOIN ver v ON v.new_id = b.new_id AND v.j_ppm = b.best_j_ppm
    GROUP BY b.new_id, b.best_j_ppm, b.n_matches
    """


INCR_J_PPM_MIN = 500_000  # J >= 0.5 flags a batch doc as duplicate


@register("dedup_incremental", oracle=_incremental_oracle())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (one-directional) near-dedup: flag each doc of an
    INCOMING batch that near-duplicates the EXISTING corpus, without
    ever pairing batch x batch or index x index — the daily-crawl
    ingest workflow at 100 TB, where the corpus index is a precomputed,
    stored band-key table and each day's cost is O(batch * bands)
    against it, not a corpus-wide recluster. The batch here is
    synthesized per doc: every third source doc arrives as a near-dup
    (first token dropped, the #34 corpus convention), the rest arrive
    genuinely new (vowels substituted, which rewrites almost every
    3-token shingle).

    Plan: both sides reuse the #34 machinery (hashed shingle sets →
    lsh_band_rows); candidates are the band-key equi-join restricted to
    batch x index; the exact-Jaccard verify re-joins hashed sets BY ID
    (pairs never carry text); the keep decision is integer-ppm
    (J >= {INCR_J_PPM_MIN} ppm) with an argmax-by-(j, -doc_id) struct
    max, so the chosen dup_of is layout-independent. Both shingle
    stages persist via _shared_stage (each feeds the band build AND the
    verify join). Reference tie: the reference's ReplacingMergeTree
    upserts are the EXACT-key version of this operator
    (models.js engine choice); this is its near-dup generalization."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def _batch() -> DataFrame:
        return d.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.expr("substring(text, instr(text, ' ') + 1)"),
            )
            .otherwise(F.translate(F.col("text"), "aeiou", "01234"))
            .alias("text"),
        )

    h_idx = _shared_stage(
        "incr_idx_shingles", spark, sf_dir,
        lambda: hashed_shingle_sets(d),
    )
    h_new = _shared_stage(
        "incr_new_shingles", spark, sf_dir,
        lambda: hashed_shingle_sets(_batch()),
    )
    b_idx = lsh_band_rows(h_idx).select(
        F.col("doc_id").alias("idx_id"), "band_key"
    )
    b_new = lsh_band_rows(h_new).select(
        F.col("doc_id").alias("new_id"), "band_key"
    )
    cand = b_new.join(b_idx, "band_key").select("new_id", "idx_id").distinct()
    sh_i = h_idx.select(F.col("doc_id").alias("idx_id"),
                        F.col("bh").alias("sh_i"))
    sh_n = h_new.select(F.col("doc_id").alias("new_id"),
                        F.col("bh").alias("sh_n"))
    ver = (
        cand.join(sh_n, "new_id")
        .join(sh_i, "idx_id")
        .select(
            "new_id", "idx_id",
            F.expr(
                "(size(array_intersect(sh_n, sh_i)) * 1000000L)"
                " div size(array_union(sh_n, sh_i))"
            ).alias("j_ppm"),
        )
        .filter(F.col("j_ppm") >= INCR_J_PPM_MIN)
    )
    best = ver.groupBy("new_id").agg(
        F.max(
            F.struct(F.col("j_ppm"), (-F.col("idx_id")).alias("nid"))
        ).alias("b"),
        F.count("*").alias("n_matches"),
    )
    return best.select(
        F.col("new_id").alias("batch_doc_id"),
        F.col("b.j_ppm").alias("best_j_ppm"),
        (-F.col("b.nid")).cast("long").alias("dup_of"),
        F.col("n_matches"),
    )


# --------------------------------------------------------------------------
# 219. minhash_band_tuning — the (bands, rows) LSH threshold sweep
# --------------------------------------------------------------------------
# every (b, r) split of the k=8 signature, with the S-curve midpoint
# (1/b)^(1/r) each setting targets — computed once here and embedded as
# the SAME literal on both engines
_BAND_CFGS = [
    (f"b{b}r{r}", b, r, int(((1 / b) ** (1 / r)) * 1_000_000))
    for b, r in ((8, 1), (4, 2), (2, 4), (1, 8))
]
_BUCKET_CAP = 64  # boilerplate mega-bucket drop threshold


def _band_tuning_oracle() -> str:
    cfg_vals = ", ".join(
        f"('{c}', {b}, {r}, {t})" for c, b, r, t in _BAND_CFGS
    )
    return f"""
    WITH {_sig_ctes()},
    cfg AS (SELECT * FROM (VALUES {cfg_vals})
            t(config, b, r, threshold_ppm)),
    rws AS (
      SELECT c.config, s.doc_id,
             c.config || ':' || CAST(g.band AS VARCHAR) || ':' ||
             array_to_string(
               list_transform(sig[g.band * c.r + 1 : g.band * c.r + c.r],
                              x -> CAST(x AS VARCHAR)), ':') AS band_key
      FROM sigl s, cfg c, generate_series(0, 7) g(band)
      WHERE g.band < c.b
    ),
    sizes AS (
      SELECT config, band_key, COUNT(*) AS n FROM rws GROUP BY 1, 2
    ),
    okb AS (
      SELECT config, band_key FROM sizes
      WHERE n >= 2 AND n <= {_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT r1.config, r1.doc_id AS a, r2.doc_id AS b2
      FROM rws r1
      JOIN okb o ON o.config = r1.config AND o.band_key = r1.band_key
      JOIN rws r2 ON r2.config = r1.config AND r2.band_key = r1.band_key
        AND r1.doc_id < r2.doc_id
    ),
    agg1 AS (
      SELECT config,
             SUM(CASE WHEN n >= 2 AND n <= {_BUCKET_CAP}
                      THEN 1 ELSE 0 END) AS n_buckets,
             SUM(CASE WHEN n > {_BUCKET_CAP} THEN 1 ELSE 0 END) AS n_dropped
      FROM sizes GROUP BY config
    ),
    agg2 AS (SELECT config, COUNT(*) AS n_pairs FROM cand GROUP BY config)
    SELECT c.config, CAST(c.b AS BIGINT) AS n_bands,
           CAST(c.r AS BIGINT) AS rows_per_band,
           CAST(c.threshold_ppm AS BIGINT) AS threshold_ppm,
           CAST(a1.n_buckets AS BIGINT) AS n_buckets,
           CAST(a1.n_dropped AS BIGINT) AS n_dropped_buckets,
           CAST(COALESCE(a2.n_pairs, 0) AS BIGINT) AS n_candidate_pairs
    FROM cfg c JOIN agg1 a1 USING (config) LEFT JOIN agg2 a2 USING (config)
    """


@register("minhash_band_tuning", oracle=_band_tuning_oracle())
def minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH threshold tuning: the candidate-volume table for every
    (bands, rows-per-band) split of the k={MINHASH_K} signature — the
    sweep a corpus owner consults before fixing the #34 banding (more
    bands = lower Jaccard threshold = more candidates; the S-curve
    midpoint (1/b)^(1/r) is reported next to the MEASURED candidate
    count so the choice is data-driven, not theoretical).

    Scale shape: signatures compute ONCE from the shared persisted
    shingle stage (the same stage #34/#36/#145 reuse — tuning adds no
    second corpus scan); each config re-bands the k-long signature in
    expression land, so the sweep's cost is the band-bucket equi-joins
    themselves — exactly the workload being measured. Mega-buckets
    (>{_BUCKET_CAP} docs — boilerplate minima) are dropped on BOTH
    engines before pairing, the production guard that keeps any
    single bucket's fan-out bounded; drops are REPORTED per config,
    never silent."""
    hashed = shared_hashed_shingles(spark, sf_dir)
    def _mh(j: int):
        # single-parameter lambda (the lsh_band_rows trap: a 2-arg
        # lambda makes transform pass (element, index))
        return F.array_min(F.transform(F.col("bh"), lambda h: minhash_perm(h, j)))

    sig_cols = [_mh(j).alias(f"mh{j}") for j in range(MINHASH_K)]
    sigs = _shared_stage(
        "band_tuning_sigs", spark, sf_dir,
        lambda: hashed.select("doc_id", *sig_cols),
    )
    per_cfg = []
    for cname, b, r, _t in _BAND_CFGS:
        keys = F.array(*[
            F.concat_ws(
                ":", F.lit(cname), F.lit(band),
                *[F.col(f"mh{band * r + i}").cast("string") for i in range(r)],
            )
            for band in range(b)
        ])
        per_cfg.append(
            sigs.select(
                F.lit(cname).alias("config"), "doc_id",
                F.explode(keys).alias("band_key"),
            )
        )
    rws = per_cfg[0]
    for p in per_cfg[1:]:
        rws = rws.unionAll(p)
    sizes = rws.groupBy("config", "band_key").agg(F.count("*").alias("n"))
    okb = sizes.filter(
        (F.col("n") >= 2) & (F.col("n") <= _BUCKET_CAP)
    ).select("config", "band_key")
    r1, r2 = rws.alias("r1"), rws.alias("r2")
    cand = (
        r1.join(
            okb.alias("o"),
            (F.col("o.config") == F.col("r1.config"))
            & (F.col("o.band_key") == F.col("r1.band_key")),
        )
        .join(
            r2,
            (F.col("r2.config") == F.col("r1.config"))
            & (F.col("r2.band_key") == F.col("r1.band_key"))
            & (F.col("r1.doc_id") < F.col("r2.doc_id")),
        )
        .select(
            F.col("r1.config").alias("config"),
            F.col("r1.doc_id").alias("a"),
            F.col("r2.doc_id").alias("b2"),
        )
        .distinct()
    )
    agg1 = sizes.groupBy("config").agg(
        F.sum(
            ((F.col("n") >= 2) & (F.col("n") <= _BUCKET_CAP)).cast("long")
        ).alias("n_buckets"),
        F.sum((F.col("n") > _BUCKET_CAP).cast("long")).alias("n_dropped"),
    )
    agg2 = cand.groupBy("config").agg(F.count("*").alias("n_pairs"))
    cfg_rows = spark.createDataFrame(
        _BAND_CFGS, "config string, b long, r long, threshold_ppm long"
    )
    return (
        cfg_rows.join(agg1, "config")
        .join(agg2, "config", "left")
        .select(
            "config",
            F.col("b").alias("n_bands"),
            F.col("r").alias("rows_per_band"),
            "threshold_ppm",
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("n_dropped").cast("long").alias("n_dropped_buckets"),
            F.coalesce(F.col("n_pairs"), F.lit(0))
            .cast("long").alias("n_candidate_pairs"),
        )
    )
