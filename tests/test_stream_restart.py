"""Kill-and-restart exactly-once tests for the custom stateful
streaming operators (VERDICT r6 item 5 / r7 item 6).

The reference's indexer is restart-safe by construction (ClickHouse
ReplacingMergeTree absorbs re-inserts; the queue table carries worker
leases) — the Spark twin's guarantee is checkpointed state + replayed
idempotent sinks. Two scenarios, both against a FAULT-TOLERANT sink
(foreachBatch writing parquet keyed by batchId — the memory sink the
query harness uses is deliberately not fault-tolerant, so these tests
drive the production sink shape instead):

1. ``stream_uniq_up_to``: a genuine mid-drain ``q.stop()`` while
   micro-batches are in flight (maxFilesPerTrigger=1 over a 4-file
   input, sink slowed so the kill lands between commits), restart from
   the same checkpoint, drain, and assert the per-key saturating
   counts equal the batch twin — replayed batches overwrite their own
   batchId directory and the state store rolls back to the last
   committed version, so the union-of-updates is exact.
2. ``stream_heavy_hitters``: stop between batches (drain 2 of 4 files,
   terminate, add the rest, restart), assert the checkpoint's file log
   prevents any re-read (sum of numInputRows across BOTH runs equals
   the table's row count — the input-side exactly-once claim) and the
   exact recount over the streamed Misra-Gries candidate union equals
   the batch heavy-hitter answer.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.streaming.event_stream import (
    SH_K,
    SH_STRIPES,
    UUT_CAP,
    _mg_stripe_fn,
    _uut_fn,
)

SF = "/root/testdata/sf0.001"


def _batch_events(spark):
    """Batch read with the same ts normalization as the stream."""
    df = spark.read.parquet(f"{SF}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _stage_input(spark, tmp_path, n_files=4):
    """Split the events table into n_files parquet files (raw ts
    preserved: the session reads TIMESTAMP(NANOS) as bigint)."""
    d = str(tmp_path / "input")
    spark.read.parquet(f"{SF}/events.parquet").repartition(
        n_files
    ).write.parquet(d)
    files = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
    assert len(files) == n_files
    return d, files


def _stream(spark, input_dir, one_file_per_trigger=False):
    batch = spark.read.parquet(input_dir)
    reader = spark.readStream.schema(batch.schema).format("parquet")
    if one_file_per_trigger:
        reader = reader.option("maxFilesPerTrigger", 1)
    s = reader.load(input_dir)
    # generation-aware like _read_event_stream: ts arrives either as
    # NANOS-as-long (older testdata) or a plain micros timestamp
    if dict(batch.dtypes)["ts"] == "bigint":
        s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return s


def _parquet_sink(out_dir, delay=0.0):
    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        if delay:
            time.sleep(delay)

    return sink


def _read_batches(spark, out_dir):
    dirs = glob.glob(os.path.join(out_dir, "batch=*"))
    assert dirs, f"no batch output under {out_dir}"
    return spark.read.parquet(*dirs)


def _uut_query(s):
    return (
        s.select(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                "day"
            ),
            "user_id",
        )
        .groupBy("event_type", "day")
        .applyInPandasWithState(
            _uut_fn,
            outputStructType=(
                "event_type string, day string, uniq_up_to long, "
                "saturated long"
            ),
            stateStructType="users array<long>",
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def test_uniq_up_to_survives_mid_drain_kill(spark, tmp_path):
    input_dir, _files = _stage_input(spark, tmp_path, n_files=4)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # run 1: one file per micro-batch, sink slowed; kill after the
    # first commit lands while later batches are still in flight
    q = (
        _uut_query(_stream(spark, input_dir, one_file_per_trigger=True))
        .writeStream.foreachBatch(_parquet_sink(out_dir, delay=1.5))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and q.isActive:
        if glob.glob(os.path.join(out_dir, "batch=*", "_SUCCESS")):
            break
        time.sleep(0.1)
    committed_before_kill = len(
        glob.glob(os.path.join(out_dir, "batch=*", "_SUCCESS"))
    )
    q.stop()
    q.awaitTermination()
    assert committed_before_kill >= 1

    # run 2: same checkpoint, drain whatever the kill left behind
    q2 = (
        _uut_query(_stream(spark, input_dir))
        .writeStream.foreachBatch(_parquet_sink(out_dir))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    got = {
        (r["event_type"], r["day"]): (r["uniq_up_to"], r["saturated"])
        for r in _read_batches(spark, out_dir)
        .groupBy("event_type", "day")
        .agg(
            F.max("uniq_up_to").alias("uniq_up_to"),
            F.max("saturated").alias("saturated"),
        )
        .collect()
    }
    exp = {
        (r["event_type"], r["day"]): (r["uniq_up_to"], r["saturated"])
        for r in _batch_events(spark)
        .select(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                "day"
            ),
            "user_id",
        )
        .groupBy("event_type", "day")
        .agg(
            F.least(
                F.countDistinct("user_id"), F.lit(UUT_CAP + 1)
            ).cast("long").alias("uniq_up_to"),
            (F.countDistinct("user_id") > UUT_CAP)
            .cast("long")
            .alias("saturated"),
        )
        .collect()
    }
    assert got == exp


def _hh_query(s):
    return (
        s.select("user_id")
        .withColumn("stripe", F.pmod("user_id", F.lit(SH_STRIPES)))
        .groupBy("stripe")
        .applyInPandasWithState(
            _mg_stripe_fn,
            outputStructType="user_id long",
            stateStructType="users array<long>, counts array<long>",
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def test_heavy_hitters_restart_reads_each_file_exactly_once(
    spark, tmp_path
):
    input_dir, files = _stage_input(spark, tmp_path, n_files=4)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # stage only half the input, drain it fully, terminate cleanly —
    # the "stream died between micro-batches" shape
    live = str(tmp_path / "live")
    os.makedirs(live)
    for f in files[:2]:
        shutil.copy(f, live)

    rows_seen = 0
    for round_files in (None, files[2:]):
        if round_files:
            for f in round_files:
                shutil.copy(f, live)
        q = (
            _hh_query(_stream(spark, live))
            .writeStream.foreachBatch(_parquet_sink(out_dir))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows_seen += sum(
            int(p["numInputRows"]) for p in q.recentProgress
        )

    total = _batch_events(spark).count()
    # input-side exactly-once: the checkpointed file log made run 2
    # skip run 1's files — every row entered the sketch exactly once
    assert rows_seen == total

    # output-side: exact recount over the streamed candidate union
    # equals the batch heavy-hitter answer (MG superset guarantee
    # carried across the restart because stripe state was restored)
    cands = _read_batches(spark, out_dir).select("user_id").distinct()
    e = _batch_events(spark)
    got = {
        (r["user_id"], r["cnt"])
        for r in e.join(F.broadcast(cands), "user_id")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * SH_K > F.lit(total))
        .collect()
    }
    exp = {
        (r["user_id"], r["cnt"])
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * SH_K > F.lit(total))
        .collect()
    }
    assert got == exp and exp, "expected at least one heavy hitter"
