"""Table catalog: parquet loaders for the test star schema.

Tables (driver-generated, see TESTDATA.md): region nation customer
supplier part orders lineitem events documents embeddings.

At 100 TB these would be partitioned parquet/iceberg tables; the loader
keeps the read declarative (``spark.read.parquet``) so Catalyst gets
predicate pushdown, column pruning, and partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Plain parquet scan — pushdown-friendly.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    rejects by default; it is read as raw nanos (``nanosAsLong``) and
    truncated to a microsecond timestamp — the same truncation DuckDB
    applies, so oracle comparisons line up.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # integer `div`, not `/`: int64-nanos / 1000.0 round-trips through
        # double and gains ±1 µs on large values
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
