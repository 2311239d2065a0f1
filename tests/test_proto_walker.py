"""Generic protobuf walker pair (functions/protobuf.py proto_scan_hex /
proto_encode_hex) — the constant-size registry path. Round-trips the
encoder through the scanner, checks the scanner against HAND-built wire
bytes (independent of the encoder), and exercises every fail-closed
branch: the reference falls back to ``{error: 'Unknown message type',
raw}`` on any decode miss (src/utils/decoder.js:20-24), so the walker
must fail LOUD-AND-WHOLE (``ok=false``), never misread shifted bytes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.functions.protobuf import (
    pf_ld,
    pf_str,
    pf_varint,
    proto_encode_hex,
    proto_scan_hex,
)


def _scan_one(spark, hex_str, max_fields=8):
    return (
        spark.range(1)
        .select(proto_scan_hex(F.lit(hex_str), max_fields).alias("s"))
        .collect()[0]["s"]
    )


def _encode_one(spark, *parts):
    return (
        spark.range(1)
        .select(proto_encode_hex(*parts).alias("h"))
        .collect()[0]["h"]
    )


def test_roundtrip_mixed_fields_and_varint_boundaries(spark):
    """encode → scan recovers every field, including the 1→2 byte
    varint boundary (127/128) and the walker's upper bound 16383."""
    h = _encode_one(
        spark,
        pf_str(1, F.lit("abc")),
        pf_varint(2, F.lit(127)),
        pf_varint(3, F.lit(128)),
        pf_varint(4, F.lit(16383)),
        pf_ld(5, F.lit("DEADBEEF")),
    )
    s = _scan_one(spark, h)
    assert s["ok"] is True
    assert bytes.fromhex(s["ld"][1]).decode() == "abc"
    assert s["vi"][2] == 127
    assert s["vi"][3] == 128
    assert s["vi"][4] == 16383
    assert s["ld"][5] == "DEADBEEF"


def test_scan_hand_built_wire_bytes(spark):
    """Scanner against raw tag/length arithmetic, independent of the
    Spark encoder: field 1 string 'abc', field 2 varint 300 (two
    little-endian 7-bit groups), field 3 two raw bytes."""
    wire = (
        bytes([0x0A, 3]) + b"abc"
        + bytes([0x10, 0xAC, 0x02])
        + bytes([0x1A, 2, 0xFF, 0xEE])
    )
    s = _scan_one(spark, wire.hex().upper())
    assert s["ok"] is True
    assert bytes.fromhex(s["ld"][1]) == b"abc"
    assert s["vi"][2] == 300
    assert s["ld"][3] == "FFEE"


def test_encoder_reproduces_hand_built_bytes(spark):
    wire = bytes([0x0A, 3]) + b"abc" + bytes([0x10, 0xAC, 0x02])
    h = _encode_one(spark, pf_str(1, F.lit("abc")), pf_varint(2, F.lit(300)))
    assert h == wire.hex().upper()


def test_nested_message_roundtrip(spark):
    """A message embedded as a length-delimited field scans cleanly at
    both levels — the registry's Any-in-Any shape."""
    inner = _encode_one(spark, pf_str(1, F.lit("uzig")), pf_str(2, F.lit("42")))
    outer = _encode_one(spark, pf_str(1, F.lit("zig1u7")), pf_ld(3, F.lit(inner)))
    so = _scan_one(spark, outer)
    assert so["ok"] is True
    si = _scan_one(spark, so["ld"][3])
    assert si["ok"] is True
    assert bytes.fromhex(si["ld"][2]).decode() == "42"


def test_empty_message_is_valid(spark):
    s = _scan_one(spark, "")
    assert s["ok"] is True
    assert s["ld"] == {} and s["vi"] == {}


@pytest.mark.parametrize(
    "hex_str",
    [
        "0D00000000",    # wire type 5 (fixed32)
        "0900000000000000F0",  # wire type 1 (fixed64)
        "0A056162",      # declared length 5, 2 payload bytes (truncated)
        "8001",          # multi-byte tag (field 16) — out of walker range
        "0A0161" "0A0162",  # duplicate field number
        "08808001",      # 3-byte varint (16384) — beyond the 2-byte bound
        "0A",            # tag with no varint byte
        "0A0361626364",  # payload longer than declared: cursor misses end
    ],
)
def test_scan_fails_closed(spark, hex_str):
    s = _scan_one(spark, hex_str)
    assert s["ok"] is False


def test_scan_fails_closed_when_fields_exceed_max(spark):
    """More fields than max_fields: the cursor can't reach the end —
    fail closed, never a silent truncation."""
    parts = [pf_varint(i, F.lit(i)) for i in range(1, 5)]
    h = _encode_one(spark, *parts)
    assert _scan_one(spark, h, max_fields=3)["ok"] is False
    assert _scan_one(spark, h, max_fields=4)["ok"] is True


def test_encoder_raises_on_field_number_above_15(spark):
    """Field 16 needs a multi-byte tag: loud failure, never an
    lpad-truncated tag byte (ADVICE r7)."""
    with pytest.raises(Exception, match="single-byte tag"):
        _encode_one(spark, pf_varint(16, F.lit(1)))


def test_encoder_raises_on_varint_overflow(spark):
    with pytest.raises(Exception, match="2-byte varint"):
        _encode_one(spark, pf_varint(1, F.lit(16384)))
