"""Streaming sink correctness: checkpointed parquet sink is
exactly-once across restarts — re-triggering with the same checkpoint
must not re-emit processed data (the property that makes the streaming
ingest a safe replacement for the reference's at-least-once writes +
ReplacingMergeTree cleanup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.streaming.event_stream import (
    _read_event_stream,
)


def _drain_to_parquet(spark, sf_dir, out, ckpt):
    s = _read_event_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    q = (
        s.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_parquet_sink_exactly_once_on_restart(spark, sf_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _drain_to_parquet(spark, sf_dir, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # restart with the SAME checkpoint: source offsets are committed,
    # so the second trigger must write nothing new
    _drain_to_parquet(spark, sf_dir, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1

    # and the sink holds exactly the source rows, no dups, no loss
    dups = (
        spark.read.parquet(out)
        .groupBy("event_id")
        .agg(F.count("*").alias("c"))
        .filter("c > 1")
        .count()
    )
    assert dups == 0
