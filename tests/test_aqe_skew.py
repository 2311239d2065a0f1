"""AQE skew-join handling — the mechanism SURVEY §4 leans on for hot
keys at 100 TB. This test manufactures a skewed join (one key holding
~all rows), drops the skew thresholds to test scale, and asserts AQE
actually split the skewed partition in the executed plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # shrink thresholds so test-sized data counts as skewed
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 200k rows, 99% on key 0 — one hot partition, rest tiny
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 99, 0)
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias(
                "payload"
            ),
        )
        right = spark.range(2_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("rv")
        )
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's QueryExecution (count()
        # would plan a different query and leave this one unfinalized)
        n = len(joined.collect())
        assert n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
