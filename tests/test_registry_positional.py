"""Hybrid positional registry decode (functions/registry_positional.py)
— claim coverage and bit-equality against the Python walker, the r10
three-path discipline: canonical bytes decode JVM-side, everything the
claims refuse falls to the Arrow tail, and the union equals the Python
path row-for-row on EVERY input (VERDICT r9 item #1)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.functions.protobuf_py import (
    registry_decode_py,
)
from zigchain_indexer_clickhouse_spark.functions.registry_positional import (
    add_positional_decode,
)
from zigchain_indexer_clickhouse_spark.plans import registry
from zigchain_indexer_clickhouse_spark.sources.tx_decode import (
    _MSG_SEND_URL,
    _REGISTRY_URL_KEYS,
    _registry_blob_hex,
    registry_decoded_df_hybrid,
)


# the claim-gated positional dispatch's 37-arm Janino battery — deep-conformance
# tier, skipped on the default (driver-window) path;
# SPARK_GRAFT_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slowbattery

URLS = dict(_REGISTRY_URL_KEYS)
SF = "/root/testdata/sf0.001"


def _tuple(d):
    return (d["type_url"], d["status"], d["amt"], d["pid"], d["yes"],
            d["timeout"])


@pytest.fixture(scope="module")
def grid_rows(spark):
    """One synthesis blob per kind × parameter set, decoded hex."""
    gen = spark.createDataFrame(
        [(e, u, v / 7.0) for e in range(80)
         for u, v in [(e * 13 % 9999, e * 31 % 997), (3, 0.0),
                      (9998, 54321.0)]],
        "event_id long, user_id long, value double",
    ).select(_registry_blob_hex().alias("blob_hex"))
    return [r["blob_hex"] for r in gen.collect()]


def _decode_claimed(spark, hexes):
    df = spark.createDataFrame([(h,) for h in hexes], "blob_hex string")
    dd = add_positional_decode(df, "blob_hex", URLS, carry=["blob_hex"])
    return dd.select("blob_hex", "__rp_d").collect()


def test_synthesis_grid_fully_claimed_and_walker_equal(spark, grid_rows):
    """Every canonical synthesis blob (all 36 types + unknown kinds,
    repeated coins, 5/9-byte varints) is CLAIMED and decodes exactly
    as the Python walker does."""
    got = _decode_claimed(spark, grid_rows)
    assert got, "empty grid"
    for r in got:
        exp = registry_decode_py(bytes.fromhex(r["blob_hex"]), URLS)
        assert r["__rp_d"] is not None, \
            f"unclaimed canonical blob (python: {exp})"
        assert _tuple(r["__rp_d"]) == exp


def test_mutated_bytes_claimed_subset_matches_walker(spark, grid_rows):
    """Truncations, bit flips, extensions and random soup: whatever
    the claims accept must equal the walker; the rest is the tail's
    problem.  Also proves the ANSI fail-closed discipline — oversized
    declared lengths and invalid UTF-8 claim-fail instead of raising
    (the r9 ADVICE crash class)."""
    rng = random.Random(11)
    cases: list[bytes] = []
    for h in grid_rows[:60]:
        b = bytes.fromhex(h)
        cases.append(b[:len(b) - rng.randrange(1, 9)])
        i = rng.randrange(len(b))
        cases.append(b[:i] + bytes([b[i] ^ (1 << rng.randrange(8))])
                     + b[i + 1:])
        cases.append(b + bytes([rng.randrange(256)]))
    # adversarial: wt=2 declaring 2^62 bytes, invalid-UTF-8 url
    cases.append(bytes.fromhex("12") + b"\x81" + b"\x80" * 7 + b"\x40")
    cases.append(b"\x0a\x02\xff\xfe\x12\x01x")
    for _ in range(150):
        cases.append(bytes(rng.randrange(256)
                           for _ in range(rng.randrange(0, 60))))
    got = _decode_claimed(spark, [c.hex().upper() for c in cases])
    claimed = 0
    for r in got:
        if r["__rp_d"] is None:
            continue
        claimed += 1
        exp = registry_decode_py(bytes.fromhex(r["blob_hex"]), URLS)
        assert _tuple(r["__rp_d"]) == exp, r["blob_hex"]
    assert claimed > 0  # unknown-url rows at least stay claimed


def test_length_overrun_claims_fail_closed(spark, grid_rows):
    """Incrementing ANY single byte of a canonical MsgSend /
    MsgUpdateClient blob — in particular each declared-length byte,
    which makes that field overrun its container — must never yield a
    claimed row that disagrees with the walker (r10 ADVICE: the
    pre-fix ld_slot / pay_at advanced by the silently-truncated
    payload's length, landing exactly on the container end and
    claiming status='ok' where the walker fail-closes to Unknown)."""
    by_url: dict[str, str] = {}
    for h in grid_rows:
        url = registry_decode_py(bytes.fromhex(h), URLS)[0]
        by_url.setdefault(url, h)
    cases: list[bytes] = []
    for key in ("send", "update_client"):
        b = bytes.fromhex(by_url[URLS[key]])
        for i in range(len(b)):
            cases.append(b[:i] + bytes([(b[i] + 1) % 256]) + b[i + 1:])
    got = _decode_claimed(spark, [c.hex().upper() for c in cases])
    mismatches = []
    for r in got:
        if r["__rp_d"] is None:
            continue
        exp = registry_decode_py(bytes.fromhex(r["blob_hex"]), URLS)
        if _tuple(r["__rp_d"]) != exp:
            mismatches.append((r["blob_hex"], _tuple(r["__rp_d"]), exp))
    assert not mismatches, mismatches[:5]


def _ld(fno: int, payload: bytes) -> bytes:
    assert len(payload) < 128
    return bytes([(fno << 3) | 2, len(payload)]) + payload


def _coin(denom: bytes, amount: bytes) -> bytes:
    return _ld(1, denom) + _ld(2, amount)


def test_claim_caps_route_to_tail_and_union_recovers(spark):
    """A 3-coin MsgSend is beyond the claimed repeat cap — the walker
    decodes it ('ok', summed), so the positional path must REFUSE it
    (NULL) and the production runner's tail must recover the walker's
    exact answer.  A non-minimal 2-byte varint stays claimed (the
    walker accepts it too)."""
    send = (_ld(1, b"zig1ua") + _ld(2, b"zig1cb")
            + _ld(3, _coin(b"uzig", b"7"))
            + _ld(3, _coin(b"uatom", b"8"))
            + _ld(3, _coin(b"uion", b"9")))
    blob3 = (_ld(1, _MSG_SEND_URL.encode()) + _ld(2, send)).hex().upper()
    # vote with the PID as a non-minimal varint (0xAA 0x00 = 42 in two
    # bytes — inside the pid field's 2-byte claim budget; the OPTION
    # field's budget is one byte, so a 2-byte option would tail)
    vote = (bytes([0x08, 0xAA, 0x00]) + _ld(2, b"zig1ua")
            + bytes([0x18, 0x01]))
    blobnm = (_ld(1, URLS["vote"].encode()) + _ld(2, vote)).hex().upper()

    got = {r["blob_hex"]: r["__rp_d"]
           for r in _decode_claimed(spark, [blob3, blobnm])}
    assert got[blob3] is None  # 3 coins: unclaimed, tail's job
    exp_nm = registry_decode_py(bytes.fromhex(blobnm), URLS)
    assert got[blobnm] is not None and _tuple(got[blobnm]) == exp_nm
    assert exp_nm[1] == "ok" and exp_nm[4] == 1  # yes vote decoded

    df = spark.createDataFrame([(blob3,), (blobnm,)], "blob_hex string")
    decoded = registry_decoded_df_hybrid(
        spark, "/tmp/test_rp_tail", "test_rp_tail", lambda: df)
    rows = sorted(tuple(r) for r in decoded.collect())
    exp = sorted([registry_decode_py(bytes.fromhex(b), URLS)
                  for b in (blob3, blobnm)])
    assert rows == exp


def test_hybrid_operator_matches_arrow_operator(spark):
    """msg_registry_decode_hybrid ≡ msg_registry_decode (Arrow default)
    on the real sf0.001 synthesis — the operator-level three-path
    anchor (the walker variant is held to the same oracle by the
    driver gate and tests/test_protobuf_py.py)."""
    qs = registry.queries()
    arrow = sorted(tuple(r) for r in
                   qs["msg_registry_decode"](spark, SF).collect())
    hybrid = sorted(tuple(r) for r in
                    qs["msg_registry_decode_hybrid"](spark, SF).collect())
    assert arrow == hybrid
    assert len(arrow) == 68
