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


# ---------------------------------------------------------------------------
# Agreement with the per-type positional scanners (VERDICT r7 item 2):
# both decode paths must recover identical fields from the same wire
# bytes — the walker is the breadth/interactive path, the scanners are
# the codegen volume path (PLANS.md r8 walker-migration row), and any
# divergence between them is a wire-format bug in one of the two.
# ---------------------------------------------------------------------------

def _walk_fields(spark, body_hex):
    s = _scan_one(spark, body_hex, 8)
    assert s["ok"] is True
    ld = {k: bytes.fromhex(v).decode() for k, v in s["ld"].items()}
    return ld, dict(s["vi"])


def test_walker_agrees_with_msg_send_scanner(spark):
    from zigchain_indexer_clickhouse_spark.functions.protobuf import (
        encode_msg_send,
        msg_send_fields,
    )

    row = spark.range(1).select(
        encode_msg_send(
            F.lit("zig1ufrom"), F.lit("zig1cto"), F.lit("uzig"),
            F.lit("123456"),
        ).alias("b")
    ).select(
        msg_send_fields(F.col("b")).alias("d"), F.hex(F.col("b")).alias("h")
    ).collect()[0]
    pos = row["d"].asDict()
    ld, _vi = _walk_fields(spark, row["h"])
    coin = _scan_one(spark, _scan_one(spark, row["h"], 8)["ld"][3], 2)
    assert ld[1] == pos["from_address"]
    assert ld[2] == pos["to_address"]
    assert bytes.fromhex(coin["ld"][1]).decode() == pos["denom"]
    assert bytes.fromhex(coin["ld"][2]).decode() == pos["amount"]


def test_walker_agrees_with_msg_vote_scanner(spark):
    from zigchain_indexer_clickhouse_spark.functions.protobuf import (
        encode_msg_vote,
        msg_vote_fields,
    )

    row = spark.range(1).select(
        encode_msg_vote(F.lit(4242), F.lit("zig1voter"), F.lit(3)).alias("b")
    ).select(
        msg_vote_fields(F.col("b")).alias("d"), F.hex(F.col("b")).alias("h")
    ).collect()[0]
    pos = row["d"].asDict()
    ld, vi = _walk_fields(spark, row["h"])
    assert vi[1] == pos["proposal_id"] == 4242
    assert ld[2] == pos["voter"]
    assert vi[3] == pos["option"] == 3


def test_walker_agrees_with_msg_transfer_scanner(spark):
    from zigchain_indexer_clickhouse_spark.functions.protobuf import (
        encode_msg_transfer,
        msg_transfer_fields,
    )

    row = spark.range(1).select(
        encode_msg_transfer(
            F.lit("transfer"), F.lit("channel-7"), F.lit("uzig"),
            F.lit("999"), F.lit("zig1sender"), F.lit("cosmos1recv"),
            F.lit(12345),
        ).alias("b")
    ).select(
        msg_transfer_fields(F.col("b")).alias("d"),
        F.hex(F.col("b")).alias("h"),
    ).collect()[0]
    pos = row["d"].asDict()
    s = _scan_one(spark, row["h"], 8)
    assert s["ok"] is True
    assert bytes.fromhex(s["ld"][1]).decode() == pos["source_port"]
    assert bytes.fromhex(s["ld"][2]).decode() == pos["source_channel"]
    assert bytes.fromhex(s["ld"][4]).decode() == pos["sender"]
    assert bytes.fromhex(s["ld"][5]).decode() == pos["receiver"]
    assert s["vi"][7] == pos["timeout_timestamp"] == 12345
    coin = _scan_one(spark, s["ld"][3], 2)
    assert bytes.fromhex(coin["ld"][2]).decode() == pos["amount"]


def test_walker_agrees_with_msg_redelegate_scanner(spark):
    from zigchain_indexer_clickhouse_spark.functions.protobuf import (
        encode_msg_redelegate,
        msg_redelegate_fields,
    )

    row = spark.range(1).select(
        encode_msg_redelegate(
            F.lit("zig1d"), F.lit("zigvaloper1"), F.lit("zigvaloper2"),
            F.lit("uzig"), F.lit("777"),
        ).alias("b")
    ).select(
        msg_redelegate_fields(F.col("b")).alias("d"),
        F.hex(F.col("b")).alias("h"),
    ).collect()[0]
    pos = row["d"].asDict()
    s = _scan_one(spark, row["h"], 8)
    assert s["ok"] is True
    assert bytes.fromhex(s["ld"][1]).decode() == pos["delegator_address"]
    assert bytes.fromhex(s["ld"][2]).decode() == pos["validator_src_address"]
    assert bytes.fromhex(s["ld"][3]).decode() == pos["validator_dst_address"]
    coin = _scan_one(spark, s["ld"][4], 2)
    assert bytes.fromhex(coin["ld"][2]).decode() == pos["amount"]


# ---------------------------------------------------------------------------
# Property: encode→scan is the identity over random field sets inside
# the walker's documented range (fields ≤ 15, varints < 16384, any
# payload bytes) — hypothesis drives the shapes, Spark does the work.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_field = st.one_of(
    st.tuples(st.just("vi"), st.integers(min_value=0, max_value=16383)),
    st.tuples(st.just("str"), st.text(
        alphabet=st.characters(codec="ascii", min_codepoint=32,
                               max_codepoint=126),
        max_size=40,
    )),
    st.tuples(st.just("ld"), st.binary(max_size=40)),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.dictionaries(st.integers(min_value=1, max_value=15), _field,
                       min_size=0, max_size=8))
def test_property_roundtrip_random_field_sets(spark, fields):
    parts = []
    for fno in sorted(fields):
        kind, v = fields[fno]
        if kind == "vi":
            parts.append(pf_varint(fno, F.lit(v)))
        elif kind == "str":
            parts.append(pf_str(fno, F.lit(v)))
        else:
            parts.append(pf_ld(fno, F.lit(v.hex().upper())))
    h = _encode_one(spark, *parts) if parts else ""
    s = _scan_one(spark, h)
    assert s["ok"] is True
    got_vi = dict(s["vi"])
    got_ld = dict(s["ld"])
    for fno in sorted(fields):
        kind, v = fields[fno]
        if kind == "vi":
            assert got_vi[fno] == v
        elif kind == "str":
            assert bytes.fromhex(got_ld[fno]).decode() == v
        else:
            assert got_ld[fno] == v.hex().upper()
    assert len(got_vi) + len(got_ld) == len(fields)
