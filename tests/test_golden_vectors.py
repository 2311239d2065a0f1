"""Golden wire vectors — frozen base64 constants decoded end-to-end
through every walker generation (VERDICT r9 item #2).

The r9 golden test synthesized its bytes with an encoder written in the
same test file, so a shared misreading of the wire format could pass
both sides.  These vectors are FROZEN LITERALS: the base64 strings
below are constants, and the breakdown comments derive every byte from
the public protobuf wire specification (tag = field_number << 3 |
wire_type; LEB128 varints, low group first, continuation bit 0x80) and
the public cosmos-sdk / ibc-go proto definitions (cosmos.tx.v1beta1
TxRaw/TxBody/AuthInfo, cosmos.bank.v1beta1 MsgSend,
ibc.applications.transfer.v1 MsgTransfer), the same registry cosmjs
compiles its generated decoders from (reference:
src/utils/decoder.js:9 defaultRegistryTypes, decoder.js:12
decodeTxRaw).  Anyone can re-derive the bytes with protoc against the
published .proto files and compare — nothing in the engine's encoder
stack participates in producing them.  (This container has no network
access and no protobuf runtime, so a tx captured live from a public
RPC endpoint is not reproducible here; a spec-derived frozen literal
with an audit trail is the strongest independent vector available —
documented limitation.)

Decoded through: the Python walker (functions/protobuf_py.py), the
expression fold walker (proto_scan_hex / tx_raw_body /
tx_body_messages / msg_send_fields), and the r10 claim-gated
positional dispatch — all three must recover the exact field values
asserted below.
"""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.functions.protobuf import (
    msg_send_fields,
    tx_body_messages,
    tx_raw_body,
)
from zigchain_indexer_clickhouse_spark.functions.protobuf_py import (
    registry_decode_py,
    walk,
)
from zigchain_indexer_clickhouse_spark.functions.registry_positional import (
    add_positional_decode,
)
from zigchain_indexer_clickhouse_spark.sources.tx_decode import (
    _REGISTRY_URL_KEYS,
    registry_decoded_struct,
)

import pytest

# pinned-wire golden vectors across all three decode paths — deep-conformance
# tier, skipped on the default (driver-window) path;
# SPARK_GRAFT_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slowbattery

URLS = dict(_REGISTRY_URL_KEYS)

# --------------------------------------------------------------------------
# Vector 1: a complete cosmos.tx.v1beta1.TxRaw carrying one MsgSend.
#
# TxRaw           = 0A A5 01 <body: 165 B>   field 1 (body_bytes), len
#                                            0xA5 0x01 = LEB128(165)
#                   12 67    <auth_info: 103 B>
#                   1A 40    <signature: 64 B>
# TxBody          = 0A 8E 01 <Any: 142 B>    field 1 (messages[0])
#                   12 12    "golden vector memo"   field 2 (memo)
# Any             = 0A 1C "/cosmos.bank.v1beta1.MsgSend"   (28 B)
#                   12 6E <MsgSend: 110 B>
# MsgSend         = 0A 2D <from_address: 45 B bech32>
#                   12 2D <to_address:   45 B bech32>
#                   1A 0E <Coin: 14 B> = 0A 05 "uatom" 12 05 "12345"
# AuthInfo        = 0A 50 <SignerInfo: 80 B>
#                     0A 46 <Any: 70 B> = 0A 1F
#                       "/cosmos.crypto.secp256k1.PubKey"
#                       12 23 <PubKey: 35 B> = 0A 21 <33-byte key,
#                         0x02 then 0x01..0x20>
#                     12 04 <ModeInfo> = 0A 02 <Single> = 08 01
#                       (mode = SIGN_MODE_DIRECT = 1)
#                     18 2A (sequence = 42)
#                   12 13 <Fee: 19 B> = 0A 0D <Coin> =
#                       0A 05 "uatom" 12 04 "2500"
#                     10 C0 9A 0C (gas_limit: LEB128(200000) =
#                       0xC0 0x9A 0x0C)
# --------------------------------------------------------------------------
TXRAW_B64 = (
    "CqUBCo4BChwvY29zbW9zLmJhbmsudjFiZXRhMS5Nc2dTZW5kEm4KLWNvc21vczFodXlk"
    "ZWV2cHozN3NkOXNua2d1bDYwNzBtc3R1cHVrdzAweGt3ORItY29zbW9zMWp2NjVzM2dy"
    "cWY2djZqbDNkcDR0NmM5dDlyazk5Y2Q4OGx5dWZsGg4KBXVhdG9tEgUxMjM0NRISZ29s"
    "ZGVuIHZlY3RvciBtZW1vEmcKUApGCh8vY29zbW9zLmNyeXB0by5zZWNwMjU2azEuUHVi"
    "S2V5EiMKIQIBAgMEBQYHCAkKCwwNDg8QERITFBUWFxgZGhscHR4fIBIECgIIARgqEhMK"
    "DQoFdWF0b20SBDI1MDAQwJoMGkADChEYHyYtNDtCSVBXXmVsc3qBiI+WnaSrsrnAx87V"
    "3OPq8fj/Bg0UGyIpMDc+RUxTWmFob3Z9hIuSmaCnrrW8"
)

FROM_ADDR = "cosmos1huydeevpz37sd9snkgul6070mstupukw00xkw9"
TO_ADDR = "cosmos1jv65s3grqf6v6jl3dp4t6c9t9rk99cd88lyufl"

# --------------------------------------------------------------------------
# Vector 2: an Any-wrapped ibc.applications.transfer.v1.MsgTransfer
# with a NANOSECOND timeout_timestamp — a real-chain-magnitude 9-byte
# wire varint (field 7 = 1713000000000000000 ns:
#   LEB128 = 80 80 FA A1 C9 8D F3 E2 17).
# Fields: 1 source_port "transfer", 2 source_channel "channel-141"
# (the well-known hub↔osmosis channel id), 3 token Coin{uatom, 99},
# 4 sender, 5 receiver, 7 timeout_timestamp.
# --------------------------------------------------------------------------
XFER_ANY_B64 = (
    "CikvaWJjLmFwcGxpY2F0aW9ucy50cmFuc2Zlci52MS5Nc2dUcmFuc2ZlchKLAQoIdHJh"
    "bnNmZXISC2NoYW5uZWwtMTQxGgsKBXVhdG9tEgI5OSItY29zbW9zMWh1eWRlZXZwejM3"
    "c2Q5c25rZ3VsNjA3MG1zdHVwdWt3MDB4a3c5Kixvc21vMWh1eWRlZXZwejM3c2Q5c25r"
    "Z3VsNjA3MG1zdHVwdWt3MHlhYzUyNjiAgPqhyY3z4hc="
)
XFER_TIMEOUT_NS = 1_713_000_000_000_000_000

# --------------------------------------------------------------------------
# Vector 3: a MULTI-COIN MsgSend (repeated Coin field 3 twice —
# uatom 1 + uosmo 2), the repeated-field shape the r8 walker
# originally failed closed on.
# --------------------------------------------------------------------------
SEND2_ANY_B64 = (
    "ChwvY29zbW9zLmJhbmsudjFiZXRhMS5Nc2dTZW5kEnYKLWNvc21vczFodXlkZWV2cHoz"
    "N3NkOXNua2d1bDYwNzBtc3R1cHVrdzAweGt3ORItY29zbW9zMWp2NjVzM2dycWY2djZq"
    "bDNkcDR0NmM5dDlyazk5Y2Q4OGx5dWZsGgoKBXVhdG9tEgExGgoKBXVvc21vEgEy"
)

# --------------------------------------------------------------------------
# Vector 4 (r11 closure): an Any-wrapped cosmos.group.v1.MsgVote.
# Any   = 0A 18 "/cosmos.group.v1.MsgVote"   (24 B url)
#         12 49 <MsgVote: 73 B>
# MsgVote (group.proto) =
#         08 AC 02      field 1 proposal_id = LEB128(300) = 0xAC 0x02
#         12 2D <45 B>  field 2 voter (bech32 address)
#         18 01         field 3 option = VOTE_OPTION_YES (1)
#         22 11 "golden group vote"   field 4 metadata (17 B)
#         28 01         field 5 exec = EXEC_TRY (1)
# --------------------------------------------------------------------------
GROUP_VOTE_ANY_B64 = (
    "ChgvY29zbW9zLmdyb3VwLnYxLk1zZ1ZvdGUSSQisAhItY29zbW9zMWh1eWRlZXZwejM3"
    "c2Q5c25rZ3VsNjA3MG1zdHVwdWt3MDB4a3c5GAEiEWdvbGRlbiBncm91cCB2b3RlKAE="
)

# --------------------------------------------------------------------------
# Vector 5 (r11 closure): an Any-wrapped
# cosmos.evidence.v1beta1.MsgSubmitEvidence carrying an Equivocation.
# Any   = 0A 2A "/cosmos.evidence.v1beta1.MsgSubmitEvidence"  (42 B)
#         12 99 01 <MsgSubmitEvidence: 153 B>
# MsgSubmitEvidence =
#         0A 2D <45 B>  field 1 submitter
#         12 68 <Any: 104 B> field 2 evidence =
#           0A 25 "/cosmos.evidence.v1beta1.Equivocation"   (37 B)
#           12 3F <Equivocation: 63 B> =
#             08 E4 89 D8 03   field 1 height = LEB128(7734500)
#             18 89 06         field 3 power  = LEB128(777)
#             22 35 <53 B>     field 4 consensus_address
# --------------------------------------------------------------------------
EVIDENCE_ANY_B64 = (
    "CiovY29zbW9zLmV2aWRlbmNlLnYxYmV0YTEuTXNnU3VibWl0RXZpZGVuY2USmQEKLWNv"
    "c21vczFodXlkZWV2cHozN3NkOXNua2d1bDYwNzBtc3R1cHVrdzAweGt3ORJoCiUvY29z"
    "bW9zLmV2aWRlbmNlLnYxYmV0YTEuRXF1aXZvY2F0aW9uEj8I5InYAxiJBiI1Y29zbW9z"
    "dmFsY29uczFodXlkZWV2cHozN3NkOXNua2d1bDYwNzBtc3R1cHVrdzBhYWJiY2M="
)

# --------------------------------------------------------------------------
# Vector 6 (r12 closure): an Any-wrapped cosmos.gov.v1.MsgVoteWeighted.
# Any   = 0A 1E "/cosmos.gov.v1.MsgVoteWeighted"  (30 B url)
#         12 60 <MsgVoteWeighted: 96 B>
# MsgVoteWeighted (gov/v1/tx.proto) =
#         08 AC 02      field 1 proposal_id = LEB128(300)
#         12 2D <45 B>  field 2 voter (bech32 address)
#         1A 18 <WeightedVoteOption: 24 B> field 3 options[0] =
#           08 01                 field 1 option = VOTE_OPTION_YES
#           12 14 "1.000000000000000000"  field 2 weight (20 B Dec str)
#         22 12 "golden v1 weighted"      field 4 metadata (18 B)
# --------------------------------------------------------------------------
GOV_V1_VW_ANY_B64 = (
    "Ch4vY29zbW9zLmdvdi52MS5Nc2dWb3RlV2VpZ2h0ZWQSYAisAhItY29zbW9zMWh1eWRl"
    "ZXZwejM3c2Q5c25rZ3VsNjA3MG1zdHVwdWt3MDB4a3c5GhgIARIUMS4wMDAwMDAwMDAw"
    "MDAwMDAwMDAiEmdvbGRlbiB2MSB3ZWlnaHRlZA=="
)

# --------------------------------------------------------------------------
# Vector 7 (r12 closure): an Any-wrapped
# ibc.core.channel.v1.MsgChannelOpenInit.
# Any   = 0A 27 "/ibc.core.channel.v1.MsgChannelOpenInit"  (39 B url)
#         12 5F <MsgChannelOpenInit: 95 B>
# MsgChannelOpenInit (channel/v1/tx.proto) =
#         0A 08 "transfer"      field 1 port_id (8 B)
#         12 24 <Channel: 36 B> field 2 channel =
#           08 01               field 1 state = STATE_INIT (1)
#           10 01               field 2 ordering = ORDER_UNORDERED (1)
#           1A 15 <Counterparty: 21 B> field 3 =
#             0A 08 "transfer"  field 1 port_id
#             12 09 "channel-7" field 2 channel_id
#           2A 07 "ics20-1"     field 5 version (7 B)
#         1A 2D <45 B>          field 3 signer (bech32 address)
# --------------------------------------------------------------------------
CHAN_OPEN_INIT_ANY_B64 = (
    "CicvaWJjLmNvcmUuY2hhbm5lbC52MS5Nc2dDaGFubmVsT3BlbkluaXQSXwoIdHJhbnNm"
    "ZXISJAgBEAEaFQoIdHJhbnNmZXISCWNoYW5uZWwtNyoHaWNzMjAtMRotY29zbW9zMWh1"
    "eWRlZXZwejM3c2Q5c25rZ3VsNjA3MG1zdHVwdWt3MDB4a3c5"
)


def test_txraw_golden_python_walker():
    """The Python walker recovers every envelope layer of the frozen
    TxRaw: body, messages, MsgSend fields, memo, and the AuthInfo
    internals (pubkey type, mode, sequence, fee)."""
    raw = base64.b64decode(TXRAW_B64)
    ok, ld, _ = walk(raw, 3)
    assert ok and 1 in ld and 2 in ld and 3 in ld
    assert len(ld[3][0]) == 64  # signature

    b_ok, b_ld, _ = walk(ld[1][0], 8)
    assert b_ok
    assert b_ld[2][0] == b"golden vector memo"
    a_ok, a_ld, _ = walk(b_ld[1][0], 2)
    assert a_ok and a_ld[1][0] == b"/cosmos.bank.v1beta1.MsgSend"
    s_ok, s_ld, _ = walk(a_ld[2][0], 8)
    assert s_ok
    assert s_ld[1][0].decode() == FROM_ADDR
    assert s_ld[2][0].decode() == TO_ADDR
    c_ok, c_ld, _ = walk(s_ld[3][0], 2)
    assert c_ok and c_ld[1][0] == b"uatom" and c_ld[2][0] == b"12345"

    au_ok, au_ld, _ = walk(ld[2][0], 2)
    assert au_ok
    si_ok, si_ld, si_vi = walk(au_ld[1][0], 3)
    assert si_ok and si_vi[3] == 42  # sequence
    pk_ok, pk_ld, _ = walk(si_ld[1][0], 2)
    assert pk_ok
    assert pk_ld[1][0] == b"/cosmos.crypto.secp256k1.PubKey"
    fee_ok, fee_ld, fee_vi = walk(au_ld[2][0], 2)
    assert fee_ok and fee_vi[2] == 200000  # gas_limit
    fc_ok, fc_ld, _ = walk(fee_ld[1][0], 2)
    assert fc_ok and fc_ld[2][0] == b"2500"

    # registry dispatch on the embedded Any: a single-coin MsgSend
    assert registry_decode_py(b_ld[1][0], URLS) == (
        "/cosmos.bank.v1beta1.MsgSend", "ok", 12345, 0, 0, 0)


def test_golden_any_vectors_python_walker():
    """Registry dispatch on the frozen Any vectors: the 9-byte
    nanosecond timeout and the 2-coin sum decode exactly."""
    assert registry_decode_py(base64.b64decode(XFER_ANY_B64), URLS) == (
        "/ibc.applications.transfer.v1.MsgTransfer", "ok", 99, 0, 0,
        XFER_TIMEOUT_NS)
    assert registry_decode_py(base64.b64decode(SEND2_ANY_B64), URLS) == (
        "/cosmos.bank.v1beta1.MsgSend", "ok", 3, 0, 0, 0)
    # r11 closure vectors: group-module vote and evidence Equivocation
    assert registry_decode_py(
        base64.b64decode(GROUP_VOTE_ANY_B64), URLS) == (
        "/cosmos.group.v1.MsgVote", "ok", 0, 300, 1, 0)
    assert registry_decode_py(
        base64.b64decode(EVIDENCE_ANY_B64), URLS) == (
        "/cosmos.evidence.v1beta1.MsgSubmitEvidence", "ok", 777, 0, 0,
        7734500)
    # r12 closure vectors: gov v1 weighted vote (nested
    # WeightedVoteOption) and the channel handshake's Channel.state
    assert registry_decode_py(
        base64.b64decode(GOV_V1_VW_ANY_B64), URLS) == (
        "/cosmos.gov.v1.MsgVoteWeighted", "ok", 0, 300, 1, 0)
    assert registry_decode_py(
        base64.b64decode(CHAN_OPEN_INIT_ANY_B64), URLS) == (
        "/ibc.core.channel.v1.MsgChannelOpenInit", "ok", 0, 0, 1, 0)


def test_txraw_golden_expression_walkers(spark):
    """The expression-land envelope readers (tx_raw_body →
    tx_body_messages → msg_send_fields) and the fold walker's registry
    dispatch recover the same fields from the frozen TxRaw."""
    raw = base64.b64decode(TXRAW_B64)
    df = spark.createDataFrame([(bytearray(raw),)], "blob binary")
    body = tx_raw_body(F.col("blob"))
    msgs = tx_body_messages(body)
    row = df.select(
        F.size(msgs).alias("n_msgs"),
        msg_send_fields(
            F.expr("substring(m, 33, 110)")  # Any.value: MsgSend bytes
        ).alias("send"),
        registry_decoded_struct(F.hex(F.element_at(msgs, 1))).alias("d"),
    ).withColumn("m", F.element_at(msgs, 1)).collect()[0] \
        if False else None
    # two steps: bind the Any blob first, then decode it
    d1 = df.select(F.element_at(msgs, 1).alias("m"))
    row = d1.select(
        registry_decoded_struct(F.hex(F.col("m"))).alias("d"),
        msg_send_fields(F.expr("substring(m, 33, 110)")).alias("send"),
    ).collect()[0]
    assert row["d"]["type_url"] == "/cosmos.bank.v1beta1.MsgSend"
    assert row["d"]["status"] == "ok"
    assert row["d"]["amt"] == 12345
    assert row["send"]["from_address"] == FROM_ADDR
    assert row["send"]["to_address"] == TO_ADDR
    assert row["send"]["denom"] == "uatom"
    assert row["send"]["amount"] == "12345"


def test_golden_vectors_positional_hybrid(spark):
    """The r10 positional dispatch claims all three frozen vectors and
    decodes them bit-identically to the Python walker — real-shaped
    bytes, not just the in-repo synthesis."""
    raw = base64.b64decode(TXRAW_B64)
    ok, ld, _ = walk(raw, 3)
    b_ok, b_ld, _ = walk(ld[1][0], 8)
    vectors = [
        b_ld[1][0].hex().upper(),
        base64.b64decode(XFER_ANY_B64).hex().upper(),
        base64.b64decode(SEND2_ANY_B64).hex().upper(),
        base64.b64decode(GROUP_VOTE_ANY_B64).hex().upper(),
        base64.b64decode(EVIDENCE_ANY_B64).hex().upper(),
        base64.b64decode(GOV_V1_VW_ANY_B64).hex().upper(),
        base64.b64decode(CHAN_OPEN_INIT_ANY_B64).hex().upper(),
    ]
    df = spark.createDataFrame([(v,) for v in vectors],
                               "blob_hex string")
    dd = add_positional_decode(df, "blob_hex", URLS, carry=["blob_hex"])
    for r in dd.collect():
        exp = registry_decode_py(bytes.fromhex(r["blob_hex"]), URLS)
        assert r["__rp_d"] is not None, f"unclaimed: python {exp}"
        got = (r["__rp_d"]["type_url"], r["__rp_d"]["status"],
               r["__rp_d"]["amt"], r["__rp_d"]["pid"],
               r["__rp_d"]["yes"], r["__rp_d"]["timeout"])
        assert got == exp and exp[1] == "ok"


def test_r12_golden_vectors_expression_walker(spark):
    """The one-tree expression dispatch (registry_decoded_struct, the
    stream/at-rest shape) decodes the r12 frozen vectors exactly: the
    gov v1 weighted vote's nested WeightedVoteOption and the channel
    handshake's Channel.state enum."""
    df = spark.createDataFrame(
        [(base64.b64decode(GOV_V1_VW_ANY_B64).hex().upper(),),
         (base64.b64decode(CHAN_OPEN_INIT_ANY_B64).hex().upper(),)],
        "blob_hex string",
    )
    rows = {
        r["d"]["type_url"]: r["d"]
        for r in df.select(
            registry_decoded_struct(F.col("blob_hex")).alias("d")
        ).collect()
    }
    vw = rows["/cosmos.gov.v1.MsgVoteWeighted"]
    assert (vw["status"], vw["pid"], vw["yes"]) == ("ok", 300, 1)
    ci = rows["/ibc.core.channel.v1.MsgChannelOpenInit"]
    assert (ci["status"], ci["yes"], ci["amt"]) == ("ok", 1, 0)
