"""Generic protobuf walker pair (functions/protobuf.py proto_scan_hex /
proto_encode_hex) — the constant-size registry path. Round-trips the
encoder through the scanner, checks the scanner against HAND-built wire
bytes (independent of the encoder), and exercises every fail-closed
branch: the reference falls back to ``{error: 'Unknown message type',
raw}`` on any decode miss (src/utils/decoder.js:20-24), so the walker
must fail LOUD-AND-WHOLE (``ok=false``), never misread shifted bytes.

Round 9 widened the walker to real-chain wire shapes (VERDICT r8
missing #1/#2): REPEATED length-delimited fields (``ld`` is now
field_no → array<payload>, wire order), varints of 1-9 bytes (full
non-negative int64 — 10⁹ heights, 10¹⁸ nanosecond timeouts), fixed32/
fixed64 capture, and proto3 last-wins merge for repeated scalars. The
tests below pin each of those against hand-built bytes.
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
    """encode → scan recovers every field across the 1→2→3...→9 byte
    varint group boundaries (127/128, 16383/16384, 2^35, int64 max)."""
    h = _encode_one(
        spark,
        pf_str(1, F.lit("abc")),
        pf_varint(2, F.lit(127)),
        pf_varint(3, F.lit(128)),
        pf_varint(4, F.lit(16383)),
        pf_ld(5, F.lit("DEADBEEF")),
        pf_varint(6, F.lit(16384)),
        pf_varint(7, F.lit(2 ** 35)),
        pf_varint(8, F.lit(2 ** 63 - 1)),
    )
    s = _scan_one(spark, h)
    assert s["ok"] is True
    assert bytes.fromhex(s["ld"][1][0]).decode() == "abc"
    assert s["vi"][2] == 127
    assert s["vi"][3] == 128
    assert s["vi"][4] == 16383
    assert s["ld"][5] == ["DEADBEEF"]
    assert s["vi"][6] == 16384
    assert s["vi"][7] == 2 ** 35
    assert s["vi"][8] == 2 ** 63 - 1


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
    assert bytes.fromhex(s["ld"][1][0]) == b"abc"
    assert s["vi"][2] == 300
    assert s["ld"][3] == ["FFEE"]


def test_scan_repeated_fields_keep_wire_order(spark):
    """cosmjs shapes that failed closed through round 8: a repeated
    length-delimited field (multi-coin amount / MsgMultiSend outputs)
    collects EVERY occurrence, in wire order."""
    wire = (
        bytes([0x0A, 5]) + b"alice"
        + bytes([0x1A, 5]) + b"coinA"
        + bytes([0x1A, 5]) + b"coinB"
        + bytes([0x1A, 5]) + b"coinC"
    )
    s = _scan_one(spark, wire.hex().upper())
    assert s["ok"] is True
    assert [bytes.fromhex(x).decode() for x in s["ld"][3]] == [
        "coinA", "coinB", "coinC"
    ]
    assert [bytes.fromhex(x).decode() for x in s["ld"][1]] == ["alice"]


def test_scan_repeated_scalar_is_last_wins(spark):
    """proto3 merge semantics for a singular scalar seen twice: the
    LAST occurrence wins (never a fail-closed, never the first)."""
    wire = bytes([0x08, 5]) + bytes([0x08, 9])
    s = _scan_one(spark, wire.hex().upper())
    assert s["ok"] is True
    assert s["vi"][1] == 9


def test_scan_wide_varints_hand_built(spark):
    """5- and 9-byte varints against hand-computed groups: 3e9 (a
    real-chain height/sequence magnitude) and 1.6e18 (a nanosecond
    IBC timeout)."""

    def enc(n):
        out = b""
        while True:
            b = n & 0x7F
            n >>= 7
            out += bytes([b | (0x80 if n else 0)])
            if not n:
                return out

    wire = bytes([0x08]) + enc(3_000_000_000) \
        + bytes([0x10]) + enc(1_600_000_000_000_000_000)
    s = _scan_one(spark, wire.hex().upper())
    assert s["ok"] is True
    assert s["vi"][1] == 3_000_000_000
    assert s["vi"][2] == 1_600_000_000_000_000_000


def test_scan_two_byte_tags_hand_built(spark):
    """Fields 16..2047 carry a 2-byte tag varint — hand-build one of
    each shape (varint, length-delimited, fixed32) and a field-2047
    boundary case; the encoder stays single-byte (synthesis never
    emits them), so these bytes come from the test's own tag math."""

    def enc_varint(n):
        out = b""
        while True:
            b = n & 0x7F
            n >>= 7
            out += bytes([b | (0x80 if n else 0)])
            if not n:
                return out

    def tag(f, w):
        return enc_varint(f << 3 | w)

    wire = (
        tag(16, 0) + enc_varint(300)
        + tag(100, 2) + bytes([3]) + b"abc"
        + tag(2047, 5) + (0xCAFEBABE).to_bytes(4, "little")
    )
    s = _scan_one(spark, wire.hex().upper())
    assert s["ok"] is True
    assert s["vi"][16] == 300
    assert [bytes.fromhex(x) for x in s["ld"][100]] == [b"abc"]
    assert s["vi"][2047] == 0xCAFEBABE


def test_scan_fixed32_and_fixed64_little_endian(spark):
    wire = bytes([0x0D]) + (0xDEADBEEF).to_bytes(4, "little") \
        + bytes([0x11]) + (1234567890123456789).to_bytes(8, "little")
    s = _scan_one(spark, wire.hex().upper())
    assert s["ok"] is True
    assert s["vi"][1] == 0xDEADBEEF
    assert s["vi"][2] == 1234567890123456789


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
    si = _scan_one(spark, so["ld"][3][0])
    assert si["ok"] is True
    assert bytes.fromhex(si["ld"][2][0]).decode() == "42"


def test_empty_message_is_valid(spark):
    s = _scan_one(spark, "")
    assert s["ok"] is True
    assert s["ld"] == {} and s["vi"] == {}


@pytest.mark.parametrize(
    "hex_str",
    [
        "0D000000",      # fixed32 truncated to 3 bytes
        "1100000000000000F0",  # fixed64 with the top bit set: > int64
        "110000000000000000" [:-2],  # fixed64 truncated to 7 bytes
        "0A056162",      # declared length 5, 2 payload bytes (truncated)
        "8001",          # 2-byte tag (field 16) with no field bytes after
        "808001" + "05",  # 3-byte tag (field > 2047) — out of range
        "0005",          # field 0 — not legal wire
        "0B",            # wire type 3 (group) — unsupported
        "0880808080808080808001",  # 10-byte varint (uint64 bit 63 set)
        "0A",            # tag with no varint byte
        "0A0361626364",  # payload longer than declared: cursor misses end
        "08808080",      # varint with continuation bit running off the end
    ],
)
def test_scan_fails_closed(spark, hex_str):
    s = _scan_one(spark, hex_str)
    assert s["ok"] is False


def test_scan_fails_closed_when_fields_exceed_max(spark):
    """More fields than max_fields: the cursor can't reach the end —
    fail closed, never a silent truncation. Repeats count as fields."""
    parts = [pf_varint(i, F.lit(i)) for i in range(1, 5)]
    h = _encode_one(spark, *parts)
    assert _scan_one(spark, h, max_fields=3)["ok"] is False
    assert _scan_one(spark, h, max_fields=4)["ok"] is True
    rep = bytes([0x1A, 1, 0x61]) * 3  # field 3 repeated thrice
    assert _scan_one(spark, rep.hex().upper(), max_fields=2)["ok"] is False
    assert _scan_one(spark, rep.hex().upper(), max_fields=3)["ok"] is True


def test_encoder_raises_on_field_number_above_15(spark):
    """Field 16 needs a multi-byte tag: loud failure, never an
    lpad-truncated tag byte (ADVICE r7)."""
    with pytest.raises(Exception, match="single-byte tag"):
        _encode_one(spark, pf_varint(16, F.lit(1)))


def test_encoder_raises_on_negative_varint(spark):
    """Negative int64 needs the 10-byte two's-complement form this
    writer does not produce: loud failure, never truncated bytes."""
    with pytest.raises(Exception, match="negative"):
        _encode_one(spark, pf_varint(1, F.lit(-1)))


def test_encoder_matches_python_reference_across_magnitudes(spark):
    """The widened varint writer against an independent pure-Python
    protobuf varint encoder at every group boundary."""

    def py_varint(n):
        out = b""
        while True:
            b = n & 0x7F
            n >>= 7
            out += bytes([b | (0x80 if n else 0)])
            if not n:
                return out.hex().upper()

    vals = [0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
            2 ** 28 - 1, 2 ** 28, 3_000_000_000, 2 ** 35 - 1, 2 ** 35,
            10 ** 15, 1_600_000_000_000_000_000, 2 ** 62, 2 ** 63 - 1]
    hs = spark.createDataFrame(
        [(v,) for v in vals], "n bigint"
    ).select(
        "n",
        proto_encode_hex(pf_varint(1, F.col("n"))).alias("h"),
    ).collect()
    for r in hs:
        assert r["h"] == "08" + py_varint(r["n"]), r["n"]


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
    ld = {k: bytes.fromhex(v[0]).decode() for k, v in s["ld"].items()}
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
    coin = _scan_one(spark, _scan_one(spark, row["h"], 8)["ld"][3][0], 2)
    assert ld[1] == pos["from_address"]
    assert ld[2] == pos["to_address"]
    assert bytes.fromhex(coin["ld"][1][0]).decode() == pos["denom"]
    assert bytes.fromhex(coin["ld"][2][0]).decode() == pos["amount"]


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
    assert bytes.fromhex(s["ld"][1][0]).decode() == pos["source_port"]
    assert bytes.fromhex(s["ld"][2][0]).decode() == pos["source_channel"]
    assert bytes.fromhex(s["ld"][4][0]).decode() == pos["sender"]
    assert bytes.fromhex(s["ld"][5][0]).decode() == pos["receiver"]
    assert s["vi"][7] == pos["timeout_timestamp"] == 12345
    coin = _scan_one(spark, s["ld"][3][0], 2)
    assert bytes.fromhex(coin["ld"][2][0]).decode() == pos["amount"]


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
    assert bytes.fromhex(s["ld"][1][0]).decode() == pos["delegator_address"]
    assert bytes.fromhex(s["ld"][2][0]).decode() == pos["validator_src_address"]
    assert bytes.fromhex(s["ld"][3][0]).decode() == pos["validator_dst_address"]
    coin = _scan_one(spark, s["ld"][4][0], 2)
    assert bytes.fromhex(coin["ld"][2][0]).decode() == pos["amount"]


# ---------------------------------------------------------------------------
# Property: encode→scan is the identity over random field sets inside
# the walker's widened range (fields ≤ 15 via the encoder path, varints 0..int64 max, any
# payload bytes, REPEATED length-delimited fields) — hypothesis drives
# the shapes, Spark does the work. Every wire field costs a step, so
# max_fields is sized to the total occurrence count.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_field = st.one_of(
    st.tuples(st.just("vi"),
              st.integers(min_value=0, max_value=2 ** 63 - 1)),
    st.tuples(st.just("str"), st.text(
        alphabet=st.characters(codec="ascii", min_codepoint=32,
                               max_codepoint=126),
        max_size=40,
    )),
    st.tuples(st.just("ld"), st.lists(st.binary(max_size=40),
                                      min_size=1, max_size=3)),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.dictionaries(st.integers(min_value=1, max_value=15), _field,
                       min_size=0, max_size=6))
def test_property_roundtrip_random_field_sets(spark, fields):
    parts, n_wire_fields = [], 0
    for fno in sorted(fields):
        kind, v = fields[fno]
        if kind == "vi":
            parts.append(pf_varint(fno, F.lit(v)))
            n_wire_fields += 1
        elif kind == "str":
            parts.append(pf_str(fno, F.lit(v)))
            n_wire_fields += 1
        else:
            for payload in v:  # repeated occurrences, wire order
                parts.append(pf_ld(fno, F.lit(payload.hex().upper())))
                n_wire_fields += 1
    h = _encode_one(spark, *parts) if parts else ""
    s = _scan_one(spark, h, max_fields=max(n_wire_fields, 1))
    assert s["ok"] is True
    got_vi = dict(s["vi"])
    got_ld = dict(s["ld"])
    for fno in sorted(fields):
        kind, v = fields[fno]
        if kind == "vi":
            assert got_vi[fno] == v
        elif kind == "str":
            assert bytes.fromhex(got_ld[fno][0]).decode() == v
        else:
            assert got_ld[fno] == [x.hex().upper() for x in v]
    assert len(got_vi) + len(got_ld) == len(fields)
