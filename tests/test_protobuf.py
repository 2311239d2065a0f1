"""Pure-expression protobuf Any walker (functions/protobuf.py) — the
decoder.js typeUrl surface without a protobuf runtime."""

from __future__ import annotations

from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.functions.protobuf import (
    any_type_url,
    encode_any,
)


def _roundtrip(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url", any_type_url(encode_any(F.col("url"))).alias("decoded")
    ).collect()
    return {r["url"]: r["decoded"] for r in out}


def test_roundtrip_cosmos_urls(spark):
    urls = [
        "/cosmos.bank.v1beta1.MsgSend",
        "/zigchain.click.MsgExec",
        "/ibc.core.channel.v1.MsgRecvPacket",
        "x",  # 1-char edge
    ]
    assert _roundtrip(spark, urls) == {u: u for u in urls}


def test_two_byte_varint_length(spark):
    """typeUrl ≥ 128 bytes takes a 2-byte varint; build the wire bytes
    by hand (little-endian 7-bit groups) and decode them."""
    url = "/long." + "a" * 194  # 200 bytes: varint C8 01
    wire = bytes([0x0A, 0xC8, 0x01]) + url.encode()
    df = spark.createDataFrame([(bytearray(wire),)], "blob binary")
    got = df.select(any_type_url(F.col("blob")).alias("u")).collect()[0]["u"]
    assert got == url


def test_non_any_blob_decodes_null(spark):
    """Blobs not starting with the Any field-1 tag → NULL (the
    reference's unknown-type fallback, decoder.js catch branch)."""
    df = spark.createDataFrame(
        [(bytearray(b"\x12\x03abc"),)], "blob binary"
    )
    assert (
        df.select(any_type_url(F.col("blob")).alias("u")).collect()[0]["u"]
        is None
    )
