"""Partitioned write path (SURVEY.md §2.1 #23 physical side).

The reference partitions storage by height range — ClickHouse
``PARTITION BY intDiv(height, 100000)`` (models.js:118) and 50k-block
PostgreSQL range partitions (partition.js:3). Spark-native equivalent:
``repartitionByRange`` on the bucket + ``partitionBy`` parquet layout,
giving partition-pruned reads on the height predicate.

``partitioned_write_readback`` writes the events table into that
layout and reads it back through a height-range filter, so the oracle
check covers write → prune → read fidelity (CORRECTNESS gate covers
the read-back rows; the layout itself is asserted in tests/).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

BUCKET_SIZE = 100  # heights per partition (reference uses 100k at chain scale)


def write_height_partitioned(df: DataFrame, path: str, height_col: str = "event_id") -> None:
    """Write with the reference's physical layout: range-partitioned by
    height bucket. repartitionByRange lines file boundaries up with
    partition values (no small-files explosion), partitionBy makes the
    bucket a directory key Catalyst can prune on."""
    bucketed = df.withColumn(
        "height_bucket", F.floor(F.col(height_col) / BUCKET_SIZE).cast("long")
    )
    (
        bucketed.repartitionByRange("height_bucket")
        .write.mode("overwrite")
        .partitionBy("height_bucket")
        .parquet(path)
    )


@register(
    "partitioned_write_readback",
    oracle=f"""
    SELECT CAST(floor(event_id / {BUCKET_SIZE}) AS BIGINT) AS height_bucket,
           COUNT(*) AS n_rows,
           CAST(MIN(event_id) AS BIGINT) AS min_height,
           CAST(MAX(event_id) AS BIGINT) AS max_height
    FROM events
    WHERE event_id >= 200 AND event_id < 500
    GROUP BY 1
    """,
)
def partitioned_write_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the physical layout: write events
    height-partitioned, read back with a range predicate (which prunes
    to 3 of N directories), aggregate per bucket. Matches the direct
    derivation the oracle computes from the source table."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"zic_spark_pwrite_{key}")
    e = load(spark, sf_dir, "events")
    write_height_partitioned(e, path)
    back = spark.read.parquet(path)
    lo, hi = 200 // BUCKET_SIZE, 500 // BUCKET_SIZE
    return (
        back.filter(
            (F.col("height_bucket") >= lo)
            & (F.col("height_bucket") < hi)
            & (F.col("event_id") >= 200)
            & (F.col("event_id") < 500)
        )
        .groupBy(F.col("height_bucket").cast("long").alias("height_bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("event_id").cast("long").alias("min_height"),
            F.max("event_id").cast("long").alias("max_height"),
        )
    )
