"""Atomic multi-table fan-out commit (VERDICT r2 item #7): a failed or
crashed fan-out must leave readers on the previous COMPLETE table set —
old or new, never a mix, never a half-written table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.sources.scratch import (
    commit_version,
    current_version_dir,
    fanout_write_atomic,
    new_version_dir,
)


def _write(vdir, name, df):
    df.write.mode("overwrite").parquet(os.path.join(vdir, name))


def test_fanout_commits_complete_set(spark, tmp_path):
    base = str(tmp_path / "fan")
    a = spark.range(10).withColumn("tag", F.lit("v1"))
    vdir = fanout_write_atomic(base, {"t1": a, "t2": a}, _write)
    assert current_version_dir(base) == vdir
    assert spark.read.parquet(os.path.join(vdir, "t1")).count() == 10


def test_failed_fanout_keeps_previous_version(spark, tmp_path):
    base = str(tmp_path / "fan")
    v1_df = spark.range(10).withColumn("tag", F.lit("v1"))
    v1 = fanout_write_atomic(base, {"t1": v1_df, "t2": v1_df}, _write)

    v2_df = spark.range(20).withColumn("tag", F.lit("v2"))

    def _failing(vdir, name, df):
        if name == "t2":
            raise RuntimeError("simulated mid-fan-out crash")
        _write(vdir, name, df)

    with pytest.raises(RuntimeError, match="simulated"):
        fanout_write_atomic(base, {"t1": v2_df, "t2": v2_df}, _failing)

    # readers still resolve the first, complete version — both tables
    # present, both from v1, and the aborted version dir is gone
    cur = current_version_dir(base)
    assert cur == v1
    for t in ("t1", "t2"):
        got = spark.read.parquet(os.path.join(cur, t))
        assert got.count() == 10
        assert got.select("tag").distinct().collect()[0][0] == "v1"
    assert [d for d in os.listdir(base) if d.startswith("v-")] == [
        os.path.basename(v1)
    ]


def test_uncommitted_version_invisible_to_readers(spark, tmp_path):
    """A version dir that was written but never committed (crash before
    the pointer flip) must stay invisible."""
    base = str(tmp_path / "fan")
    df = spark.range(5).withColumn("tag", F.lit("v1"))
    v1 = fanout_write_atomic(base, {"t1": df}, _write)
    orphan = new_version_dir(base)  # "crash" right after writing files
    _write(orphan, "t1", spark.range(99).withColumn("tag", F.lit("half")))
    assert current_version_dir(base) == v1
    # a later successful commit supersedes and GCs the orphan
    v2 = fanout_write_atomic(base, {"t1": df}, _write)
    assert current_version_dir(base) == v2
    assert not os.path.isdir(orphan)


def test_pointer_flip_is_atomic_replace(tmp_path):
    """commit_version goes through one os.replace of the pointer file;
    a reader never observes a missing or truncated pointer."""
    base = str(tmp_path / "fan")
    os.makedirs(base)
    v1 = new_version_dir(base)
    commit_version(base, v1)
    v2 = new_version_dir(base)
    commit_version(base, v2)
    assert current_version_dir(base) == v2
