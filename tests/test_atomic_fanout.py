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


def test_write_once_at_rest_two_process_race(spark, tmp_path, monkeypatch):
    """Cross-PROCESS rename race on the at-rest dataset (VERDICT r10
    item 7: the suite exercised only threads): a SECOND python
    interpreter with its own SparkSession commits the dataset while
    this process sits between its _SUCCESS check and its rename. The
    loser's rename fails (ENOTEMPTY), the lost-race branch must
    discard the loser's temp dir and leave the winner's COMPLETE
    dataset readable — never rmtree a directory carrying another
    process's _SUCCESS."""
    import subprocess
    import sys
    import textwrap

    from zigchain_indexer_clickhouse_spark.sources import tx_decode

    path = str(tmp_path / "at_rest_race")
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {repr(os.getcwd())})
        from pyspark.sql import SparkSession, functions as F
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.enabled", "false")
                 .appName("at-rest-race-winner").getOrCreate())
        from zigchain_indexer_clickhouse_spark.sources.tx_decode import (
            _write_once_at_rest,
        )
        df = spark.range(100).select(
            (F.col("id") % 4).alias("height_bucket"),
            F.col("id").alias("height"))
        _write_once_at_rest(df, {repr(path)})
        print("WINNER-COMMITTED")
        spark.stop()
    """)

    # the loser's dataset is DIFFERENT (50 rows) so the final read
    # proves whose commit survived
    loser_df = spark.range(50).select(
        (F.col("id") % 4).alias("height_bucket"),
        F.col("id").alias("height"))

    state = {"proc": None}
    real_rename = os.rename

    def racing_rename(src, dst):
        if dst == path and state["proc"] is None:
            # we are past the _SUCCESS check with our temp dir built:
            # NOW let the other interpreter run to commit first
            state["proc"] = subprocess.run(
                [sys.executable, "-c", script],
                capture_output=True, text=True, timeout=600)
            assert "WINNER-COMMITTED" in state["proc"].stdout, \
                state["proc"].stderr[-2000:]
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", racing_rename)
    try:
        tx_decode._write_once_at_rest(loser_df, path)  # must NOT raise
    finally:
        monkeypatch.undo()

    assert state["proc"] is not None, "race never reached the rename"
    assert os.path.isfile(os.path.join(path, "_SUCCESS"))
    got = spark.read.parquet(path)
    assert got.count() == 100  # the winner's dataset, intact
    # the loser cleaned up: no temp-sibling debris
    debris = [d for d in os.listdir(tmp_path)
              if d.startswith("at_rest_race.tmp-")]
    assert debris == []
