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


# ---------------------------------------------------------------------------
# Round-9 extension (VERDICT r8 item 6): the remaining stateful streams
# carry the same checkpoint-recovery risk class — each is restarted
# (mid-drain kill or between-batches) with the checkpoint intact and
# the drained+finalized result asserted equal to the batch answer.
# The watermarked queries (sessionize, agg_states) stage their input
# TIME-ORDERED: a restart must not manufacture late data the watermark
# would legitimately drop — that would test watermark semantics, not
# recovery.
# ---------------------------------------------------------------------------


def _stage_input_by_time(spark, tmp_path, n_files=4):
    """Split events into n_files parquet files RANGE-PARTITIONED by ts
    and return them in ascending time order."""
    d = str(tmp_path / "input")
    (
        spark.read.parquet(f"{SF}/events.parquet")
        .repartitionByRange(n_files, "ts")
        .write.parquet(d)
    )
    files = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
    assert len(files) == n_files
    # part-file numbering follows the range partitioner's order, but
    # order by each file's min ts to be explicit about the contract
    def _min_ts(f):
        return spark.read.parquet(f).agg(F.min("ts")).collect()[0][0]

    return d, sorted(files, key=_min_ts)


def _user_state_query(s):
    from zigchain_indexer_clickhouse_spark.streaming.event_stream import (
        _user_state_fn,
    )

    return (
        s.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_state_fn,
            outputStructType=(
                "user_id long, n_events long, total_value double"
            ),
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def test_user_state_survives_mid_drain_kill(spark, tmp_path):
    """Per-user running (count, sum) state: kill mid-drain, restart
    from the checkpoint, finalize (max count wins) — equals the batch
    per-user aggregate exactly."""
    input_dir, _files = _stage_input(spark, tmp_path, n_files=4)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    q = (
        _user_state_query(_stream(spark, input_dir, one_file_per_trigger=True))
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
    q.stop()
    q.awaitTermination()

    q2 = (
        _user_state_query(_stream(spark, input_dir))
        .writeStream.foreachBatch(_parquet_sink(out_dir))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in _read_batches(spark, out_dir)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .collect()
    }
    exp = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in _batch_events(spark)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == exp


def test_gap_detection_bitmap_state_survives_mid_drain_kill(
    spark, tmp_path
):
    """Per-stripe seen-height bitmaps: kill mid-drain, restart, and the
    or-folded coverage still finds exactly the planted gaps (bitmap
    or-ing makes replays idempotent; state rollback keeps them exact)."""
    from zigchain_indexer_clickhouse_spark.streaming.event_stream import (
        GAP_PLANT_MOD,
        GAP_PLANT_RES,
        GAP_STRIPE,
        _gap_stripe_fn,
    )

    input_dir, _files = _stage_input(spark, tmp_path, n_files=4)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def gap_query(s):
        heights = (
            s.filter(F.col("event_id") % GAP_PLANT_MOD != GAP_PLANT_RES)
            .select(
                F.expr(f"event_id div {GAP_STRIPE}").alias("stripe"),
                (F.col("event_id") % GAP_STRIPE).cast("long").alias("pos"),
            )
        )
        return heights.groupBy("stripe").applyInPandasWithState(
            _gap_stripe_fn,
            outputStructType=(
                "stripe long, n_seen long, min_h long, max_h long"
            ),
            stateStructType="words array<long>",
            outputMode="update",
            timeoutConf="NoTimeout",
        )

    q = (
        gap_query(_stream(spark, input_dir, one_file_per_trigger=True))
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
    q.stop()
    q.awaitTermination()

    q2 = (
        gap_query(_stream(spark, input_dir))
        .writeStream.foreachBatch(_parquet_sink(out_dir))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    per_stripe = (
        _read_batches(spark, out_dir)
        .groupBy("stripe")
        .agg(
            F.max("n_seen").alias("n_seen"),
            F.max_by("min_h", "n_seen").alias("min_h"),
            F.max_by("max_h", "n_seen").alias("max_h"),
        )
    )
    bounds = per_stripe.agg(
        F.min("min_h").alias("gmin"), F.max("max_h").alias("gmax")
    )
    expected_span = (
        F.least((F.col("stripe") + 1) * GAP_STRIPE - 1, F.col("gmax"))
        - F.greatest(F.col("stripe") * GAP_STRIPE, F.col("gmin"))
        + 1
    )
    got = {
        (r["stripe"], r["n_seen"], r["n_missing"])
        for r in per_stripe.crossJoin(F.broadcast(bounds))
        .withColumn("n_missing", expected_span - F.col("n_seen"))
        .filter(F.col("n_missing") > 0)
        .select("stripe", "n_seen", "n_missing")
        .collect()
    }
    kept = _batch_events(spark).filter(
        F.col("event_id") % GAP_PLANT_MOD != GAP_PLANT_RES
    )
    bstripe = (
        kept.select(
            F.expr(f"event_id div {GAP_STRIPE}").alias("stripe"),
            "event_id",
        )
        .groupBy("stripe")
        .agg(F.countDistinct("event_id").alias("n_seen"))
    )
    bb = kept.agg(
        F.min("event_id").alias("gmin"), F.max("event_id").alias("gmax")
    )
    exp = {
        (r["stripe"], r["n_seen"], r["n_missing"])
        for r in bstripe.crossJoin(F.broadcast(bb))
        .withColumn("n_missing", expected_span - F.col("n_seen"))
        .filter(F.col("n_missing") > 0)
        .select("stripe", "n_seen", "n_missing")
        .collect()
    }
    assert got == exp and exp, "expected planted gaps to surface"


def test_sessionize_restart_between_batches(spark, tmp_path):
    """Native session_window state across a restart: drain the older
    half of a TIME-ORDERED input, terminate, add the newer half,
    restart from the checkpoint — the appended sessions equal the
    lag+cumsum batch construction under the final-watermark emission
    predicate (open sessions at the kill point were neither lost nor
    double-emitted)."""
    _d, files = _stage_input_by_time(spark, tmp_path, n_files=4)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    live = str(tmp_path / "live")
    os.makedirs(live)

    def session_query(s):
        return (
            s.withWatermark("ts", "1 hour")
            .groupBy(
                "user_id",
                F.session_window("ts", "30 minutes").alias("w"),
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("session_value"),
            )
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
                "session_value",
            )
        )

    for round_files in (files[:2], files[2:]):
        for f in round_files:
            shutil.copy(f, live)
        q = (
            session_query(_stream(spark, live))
            .writeStream.foreachBatch(_parquet_sink(out_dir))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], r["session_value"])
        for r in _read_batches(spark, out_dir).collect()
    }

    # batch construction: lag >= 30 min starts a session; emission =
    # session_end (last event + 30 min) < max(ts) - 1 hour
    from pyspark.sql import Window

    e = _batch_events(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
               >= 1800),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    sess = o.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )
    cut = e.agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("c")
    ).collect()[0]["c"]
    exp = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], r["session_value"])
        for r in sess.filter(F.col("session_end") < F.lit(cut)).collect()
    }
    assert got == exp and exp


def test_agg_states_restart_between_batches(spark, tmp_path):
    """Windowed daily partial states (count/sum/min/max) across a
    restart on time-ordered input: finalized states merged monthly
    equal the direct batch monthly aggregate."""
    _d, files = _stage_input_by_time(spark, tmp_path, n_files=4)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    live = str(tmp_path / "live")
    os.makedirs(live)

    def agg_query(s):
        return (
            s.withWatermark("ts", "1 day")
            .groupBy("event_type", F.window("ts", "1 day").alias("w"))
            .agg(
                F.count("*").alias("cnt"),
                F.sum("value").alias("sum_v"),
                F.min("value").alias("min_v"),
                F.max("value").alias("max_v"),
            )
            .select(
                "event_type",
                F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
                F.date_format(F.col("w.start"), "yyyy-MM").alias("month"),
                "cnt", "sum_v", "min_v", "max_v",
            )
        )

    for round_files in (files[:2], files[2:]):
        for f in round_files:
            shutil.copy(f, live)
        q = (
            agg_query(_stream(spark, live))
            .writeStream.foreachBatch(_parquet_sink(out_dir))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    states = _read_batches(spark, out_dir)
    final = states.groupBy("event_type", "day", "month").agg(
        F.max("cnt").alias("cnt"),
        F.max_by("sum_v", "cnt").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
    got = {
        (r["event_type"], r["month"], r["n_events"], r["sum_value"],
         r["min_value"], r["max_value"])
        for r in final.groupBy("event_type", "month")
        .agg(
            F.sum("cnt").cast("long").alias("n_events"),
            F.round(F.sum("sum_v"), 2).alias("sum_value"),
            F.round(F.min("min_v"), 4).alias("min_value"),
            F.round(F.max("max_v"), 4).alias("max_value"),
        )
        .collect()
    }
    exp = {
        (r["event_type"], r["month"], r["n_events"], r["sum_value"],
         r["min_value"], r["max_value"])
        for r in _batch_events(spark)
        .groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM").alias("month"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .collect()
    }
    assert got == exp and exp


def test_stateful_stream_identical_under_rocksdb_state_store(
    spark, sf_dir
):
    """VERDICT r11 next #7: the default HDFSBackedStateStore keeps all
    keyed state on-heap — the RIGHT production provider at 100 TB
    state is RocksDB (off-heap, spill-to-disk, incremental
    checkpoints), switchable via SPARK_GRAFT_STATE_STORE=rocksdb in
    session.py. This pins the two providers' drained outputs
    identical on the custom applyInPandasWithState operator, so the
    switch is a pure storage decision with no semantics drift."""
    from zigchain_indexer_clickhouse_spark.plans import registry

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = ("org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    prev = spark.conf.get(key)
    fn = registry.queries()["stream_user_state"]

    def drained() -> set:
        return {
            (r["user_id"], r["n_events"], r["total_value"])
            for r in fn(spark, sf_dir).collect()
        }

    base = drained()
    spark.conf.set(key, rocks)
    try:
        under_rocks = drained()
    finally:
        spark.conf.set(key, prev)
    assert under_rocks == base and base
