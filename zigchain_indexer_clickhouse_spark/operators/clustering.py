"""Iterative clustering over the embeddings table (SURVEY.md §2.3
#136): Lloyd's k-means, integer-exact so the DuckDB oracle replays
every assignment bit-for-bit.

k-means is the canonical iterative Spark algorithm (MLlib's KMeans is
this exact loop): per iteration, (1) assign each vector to its nearest
centroid — centroids are k tiny rows, shipped to executors as
LITERALS (the broadcast-variable pattern; k·d ints, no join at all),
(2) recompute centroids with one distributed (cluster, dim) aggregate,
(3) collect the k new rows to the driver. The only driver traffic per
round is k×d integers — the same "per-round scalar collect" contract
dedup_clusters uses.

Determinism across engines: embeddings quantize to integers
(round(x·1000)), distances are integer ‖a−b‖², and centroid means are
integer-floored (s DIV n) — no float summation order anywhere, so
Spark and DuckDB agree exactly. Ties (equal distance) break toward the
lower centroid id.

Reference parity: the reference has no ML surface; this extends the
training-data pipeline (§2.3) where embedding_centroids (#98) is the
single-step primitive and ann_ivf_coarse (#67) consumes exactly this
kind of coarse quantizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

KMEANS_K = 8
KMEANS_ITERS = 3
QUANT_SCALE = 1000
EMB_DIM = 64


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q: array<long>) — embeddings scaled by {QUANT_SCALE}
    and rounded to integers. float32→double is exact, double·1000 is
    IEEE-deterministic, and both engines round ties away from zero."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long"),
        ).alias("q"),
    )


def _dist2_to(cvec: list[int]) -> F.Column:
    """Integer squared distance from column q to a LITERAL centroid."""
    lit = F.array(*[F.lit(int(v)) for v in cvec])
    return F.aggregate(
        F.zip_with(F.col("q"), lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(quant: DataFrame, centroids: dict[int, list[int]]) -> DataFrame:
    """Add (cluster, dist2) = argmin over the k literal centroids.
    Pure expression land: the per-vector cost is k·d integer ops inside
    whole-stage codegen — no join, no shuffle."""
    pairs = F.array(
        *[
            F.struct(
                _dist2_to(centroids[c]).alias("d"),
                F.lit(c).cast("int").alias("c"),
            )
            for c in sorted(centroids)
        ]
    )
    best = F.array_min(pairs)
    return quant.select(
        "vec_id",
        "q",
        best["c"].alias("cluster"),
        best["d"].alias("dist2"),
    )


def _update(assigned: DataFrame) -> dict[int, list[int]]:
    """One (cluster, dim) aggregate → k floored-mean centroids,
    collected to the driver (k·d ints)."""
    dims = assigned.select("cluster", F.posexplode("q").alias("i", "v"))
    per = (
        dims.groupBy("cluster", "i")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .withColumn("cv", F.expr("s DIV n"))
    )
    rows = (
        per.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cv"))),
                lambda st: st["cv"],
            ).alias("cvec")
        )
        .collect()
    )
    return {r.cluster: list(r.cvec) for r in rows}


def _kmeans_oracle() -> str:
    d, k, sc = EMB_DIM, KMEANS_K, QUANT_SCALE
    quant = f"""
    quant AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {sc}) AS BIGINT)) AS q
      FROM embeddings
    ),
    cent0 AS (
      SELECT CAST(vec_id AS INT) AS c, q AS cvec FROM quant
      WHERE vec_id < {k}
    )"""
    steps = []
    for it in range(KMEANS_ITERS):
        prev, asg, upd, nxt = (
            f"cent{it}",
            f"asg{it}",
            f"upd{it}",
            f"cent{it + 1}",
        )
        steps.append(f"""
    {asg} AS (
      SELECT vec_id, q, c AS cluster, dist2 FROM (
        SELECT v.vec_id, v.q, ct.c,
               CAST(list_dot_product(v.q, v.q) + list_dot_product(ct.cvec, ct.cvec)
                    - 2 * list_dot_product(v.q, ct.cvec) AS BIGINT) AS dist2,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY CAST(list_dot_product(v.q, v.q)
                                    + list_dot_product(ct.cvec, ct.cvec)
                                    - 2 * list_dot_product(v.q, ct.cvec) AS BIGINT),
                                  ct.c) AS rn
        FROM quant v, {prev} ct
      ) WHERE rn = 1
    ),
    {upd} AS (
      SELECT cluster AS c, list(cv ORDER BY i) AS cvec FROM (
        SELECT a.cluster, g.i, SUM(a.q[g.i]) // COUNT(*) AS cv
        FROM {asg} a, generate_series(1, {d}) g(i)
        GROUP BY a.cluster, g.i
      ) GROUP BY cluster
    ),
    {nxt} AS (
      SELECT p.c, COALESCE(u.cvec, p.cvec) AS cvec
      FROM {prev} p LEFT JOIN {upd} u ON u.c = p.c
    )""")
    final = f"""
    SELECT vec_id, CAST(c AS INT) AS cluster, dist2 FROM (
      SELECT v.vec_id, ct.c,
             CAST(list_dot_product(v.q, v.q) + list_dot_product(ct.cvec, ct.cvec)
                  - 2 * list_dot_product(v.q, ct.cvec) AS BIGINT) AS dist2,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY CAST(list_dot_product(v.q, v.q)
                                  + list_dot_product(ct.cvec, ct.cvec)
                                  - 2 * list_dot_product(v.q, ct.cvec) AS BIGINT),
                                ct.c) AS rn
      FROM quant v, cent{KMEANS_ITERS} ct
    ) WHERE rn = 1"""
    return "WITH " + quant + "," + ",".join(steps) + final


@register("kmeans_lloyd", oracle=_kmeans_oracle())
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KMEANS_ITERS} Lloyd iterations, k={KMEANS_K}, over quantized
    embeddings; returns each vector's final (cluster, dist²).
    Initial centroids are the first k vectors (deterministic); empty
    clusters keep their previous centroid.

    Plan per iteration: assignment is ZERO-shuffle (centroids inlined
    as literals — the broadcast pattern with k·d ints), update is one
    (cluster, dim) partial agg whose exchange carries k·d rows per
    map partition. Driver sees k·d ints per round. At 100 TB this is
    MLlib's own k-means shape — scales with executors, iterations
    bounded."""
    from zigchain_indexer_clickhouse_spark.operators.dedup import _shared_stage

    quant = _shared_stage(
        "kmeans_quantized", spark, sf_dir,
        lambda: _quantized(spark, sf_dir),
    )
    centroids = {
        int(r.vec_id): list(r.q)
        for r in quant.filter(F.col("vec_id") < KMEANS_K).collect()
    }
    for _ in range(KMEANS_ITERS):
        new = _update(_assign(quant, centroids))
        centroids = {c: new.get(c, centroids[c]) for c in centroids}
    return _assign(quant, centroids).select("vec_id", "cluster", "dist2")
