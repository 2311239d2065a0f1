"""Per-application scratch directories for operators that stage data on
local disk (bucketed layouts, partitioned-write round-trips, streaming
fan-out sinks).

Round-1 postmortem (VERDICT.md "What's wrong" #1): these paths used to
be keyed only on a hash of the sf_dir, so two concurrent Spark
processes raced on the SAME /tmp directory — one overwrote files while
the other read them — and a persisted metastore entry could point at a
/tmp dir that no longer exists. Both failure modes disappear when the
path embeds ``sparkContext.applicationId``: every Spark application
gets its own namespace, and a table handle is only trusted when its
backing files are actually present.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import SparkSession


def scratch_dir(spark: SparkSession, label: str, sf_dir: str) -> str:
    """A scratch path unique to (this Spark application, label, sf_dir).

    Concurrent applications never share it, so overwrite races across
    processes are impossible by construction; within one application
    the path is stable, so per-session caching still works.
    """
    app_id = spark.sparkContext.applicationId
    key = hashlib.md5(f"{sf_dir}|{label}".encode()).hexdigest()[:8]
    return os.path.join(
        tempfile.gettempdir(), f"zic_spark_{app_id}", f"{label}_{key}"
    )


def table_is_materialized(spark: SparkSession, table: str, path: str) -> bool:
    """True only when the catalog knows ``table`` AND its backing files
    exist — guards against metastore entries that outlive their /tmp
    data (the round-1 bucketed_colocated_join failure)."""
    return spark.catalog.tableExists(table) and os.path.isdir(path)
