"""Claim-gated positional registry decode — the JVM VOLUME path
(VERDICT r9 "Next round" #1: hybrid JVM dispatch).

Three execution shapes now cover the registry decode:

* expression walker (``proto_scan_hex`` folds) — constant plan size,
  interpreted ~1.4 ms/row: the conformance harness, oracle-gated every
  round via the ``msg_registry_decode_walker`` operator.
* Arrow-batched Python walker (``registry_decode_py``) — ~27 µs/row:
  the BREADTH path (handles every wire form the walker defines) and
  the streaming path.
* THIS module — per-type positional scanners over a handful of chained
  projections, pure codegen expressions at ~ns/row, CLAIM-GATED: a row
  is *claimed* only when its bytes are exactly the canonical cosmjs
  encoding the type's proto defines (1-byte inner lengths, fields in
  schema order, varints within per-field width budgets, declared
  lengths landing exactly on container ends).  Claimed rows decode
  JVM-side with results identical to the Python walker (property-
  tested over the synthesis grid, mutated bytes and random soup);
  everything else — truncations, 2-byte inner lengths, unusual field
  orders, repeat counts beyond the claimed caps — falls to the Python
  TAIL, so the hybrid's row-level semantics are the walker's on every
  input.  cosmjs itself dispatches per-type generated decoders behind
  the registry lookup (reference: src/utils/decoder.js:9-29); this is
  that dispatch expressed as Catalyst expressions.

Why SQL TEXT and not Column objects: Spark 4's Column API normalizes
(deep-copies) the entire child tree on EVERY operation
(sql/internal/columnNodes.scala normalize), so composing a ~20K-node
dispatch out of python Columns is quadratic and explodes shared
subtrees at construction time — measured 256 s of build and a driver
heap OOM for this very dispatch (and it retroactively explains the
r6 positional-scanner "minutes per invocation" history, PLANS.md).
Emitting each projection as one ``selectExpr`` string costs a single
ANTLR parse instead.  Within a projection, positions compose
TEXTUALLY (~3^fields duplication), so every arm is depth-bounded
(≤ ~4 sequential variable-length fields) by resuming from bound mid
positions and advancing over bound slot payloads by their length —
the duplication cap that also keeps every generated Janino method
under the 64 KB whole-stage limit the r10 layer probes hit
(tools/layers_probe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_D_TYPE = ("struct<type_url:string,status:string,amt:bigint,"
           "pid:bigint,yes:bigint,timeout:bigint>")


def _hb(h: str, p: str) -> str:
    """SQL: byte value at 1-indexed BYTE position ``p`` of BINARY col
    ``h`` (NULL past the end — conv(hex('')) is NULL).  Everything in
    this module runs on BinaryType: Substring on binary is an O(1)
    byte slice, while UTF8String.substring scans from the string start
    counting codepoints — the hex-string version of this dispatch
    measured ~500 µs/row of pure position-scan cost."""
    return (f"CAST(CONV(HEX(SUBSTRING({h}, CAST({p} AS INT), 1)), "
            f"16, 10) AS BIGINT)")


class Cur:
    """A claimed positional cursor over a hex column, in SQL text.
    ``pos``/``ok`` are SQL fragments; NULL means claim-fail and
    propagates.  Positions COMPOSE textually, so keep sequences short
    (≤ ~4 variable-length fields) and bind longer payloads / resume
    positions as columns first."""

    def __init__(self, h: str, pos: str | None = None,
                 ok: str | None = None):
        self.h = h
        self.pos = pos if pos is not None else "CAST(1 AS BIGINT)"
        self.ok = ok if ok is not None else "TRUE"

    def _with(self, pos: str, ok: str) -> "Cur":
        return Cur(self.h, pos, ok)

    def _tag(self, fno: int, wt: int) -> str:
        return f"({_hb(self.h, self.pos)} = {(fno << 3) | wt})"

    # -- length-delimited field: returns (payload_sql, next_cur) --------
    def ld(self, fno: int) -> tuple[str, "Cur"]:
        # NULLIF(LEAST(b,128),128): "b if b < 128 else NULL" with ONE
        # reference of the byte read — the naive CASE doubles the
        # position subtree per field and the dispatch text grows 3^k
        # (13.6 MB measured); this idiom keeps it ~2^k
        ln = f"NULLIF(LEAST({_hb(self.h, f'({self.pos}+1)')}, 128), 128)"
        payload = (f"SUBSTRING({self.h}, CAST(({self.pos}+2) AS INT), "
                   f"CAST({ln} AS INT))")
        nxt = self._with(f"({self.pos}+2+{ln})",
                         f"({self.ok} AND {self._tag(fno, 2)})")
        return payload, nxt

    # -- ld field with a 1-2 byte length (the Any value is the one
    # field that routinely exceeds 127 bytes) ---------------------------
    def ld_wide(self, fno: int) -> tuple[str, "Cur"]:
        b0 = _hb(self.h, f"({self.pos}+1)")
        b1 = _hb(self.h, f"({self.pos}+2)")
        ln = (f"(CASE WHEN {b0} < 128 THEN {b0} "
              f"WHEN {b1} < 128 THEN ({b0}-128) + SHIFTLEFT({b1}, 7) END)")
        lsz = f"(CASE WHEN {b0} < 128 THEN 1 ELSE 2 END)"
        start = f"({self.pos}+1+{lsz})"
        payload = (f"SUBSTRING({self.h}, CAST({start} AS INT), "
                   f"CAST({ln} AS INT))")
        nxt = self._with(f"({start}+{ln})",
                         f"({self.ok} AND {self._tag(fno, 2)})")
        return payload, nxt

    # -- ld field advanced via an already-bound slot column -------------
    def ld_slot(self, fno: int, slot: str) -> "Cur":
        """Advance over an ld field whose payload was bound earlier as
        column ``slot`` (built by the same extraction on the same
        bytes) — this is what keeps deep types' trees shallow.  NULL
        slot poisons.  The declared length byte must EQUAL
        LENGTH(slot): SUBSTRING silently truncates a payload whose
        declared length overruns the container, and advancing by the
        truncated length would land the cursor exactly on the
        container end — claiming a blob the walker fail-closes on
        (r10 ADVICE: fail-open overrun)."""
        ok = (f"(CASE WHEN {slot} IS NOT NULL "
              f"AND {_hb(self.h, f'({self.pos}+1)')} = LENGTH({slot}) "
              f"THEN ({self.ok} AND {self._tag(fno, 2)}) END)")
        return self._with(f"({self.pos}+2+LENGTH({slot}))", ok)

    # -- varint field: returns (value_sql, next_cur) ----------------------
    def vi(self, fno: int, maxb: int,
           need_value: bool = True) -> tuple[str | None, "Cur"]:
        """Claimed varint of at most ``maxb`` wire bytes (1-9).  The
        whole varint is matched by ONE regexp (continuation bytes have
        hex high-nibble ≥ 8; the final byte < 0x80 — truncated or
        over-budget varints simply do not match, NULLing the claim),
        so the position subtree is referenced once instead of
        ~2·maxb times.  Longer-than-budget encodings (legal, decoded
        by the Python walker) are claim-fails → tail.  Pass
        ``need_value=False`` for skip-only fields to keep the text
        small."""
        win = (f"HEX(SUBSTRING({self.h}, CAST(({self.pos}+1) AS INT), "
               f"{maxb}))")
        pat = f"^((?:[89A-F][0-9A-F]){{0,{maxb - 1}}}[0-7][0-9A-F])"
        vh = f"NULLIF(REGEXP_EXTRACT({win}, '{pat}', 1), '')"
        val = None
        if need_value:
            terms = []
            for j in range(maxb):
                b = (f"CAST(CONV(SUBSTR({vh}, {2 * j + 1}, 2), 16, 10) "
                     f"AS BIGINT)")
                grp = (f"({b} - (CASE WHEN LENGTH({vh}) > {2 * j + 2} "
                       f"THEN 128 ELSE 0 END))")
                terms.append(f"(CASE WHEN LENGTH({vh}) > {2 * j} "
                             f"THEN SHIFTLEFT({grp}, {7 * j}) ELSE 0 END)")
            val = (f"(CASE WHEN {vh} IS NOT NULL THEN "
                   f"CAST(({'+'.join(terms)}) AS BIGINT) END)")
        nxt = self._with(f"({self.pos}+1+(LENGTH({vh}) DIV 2))",
                         f"({self.ok} AND {self._tag(fno, 0)})")
        return val, nxt

    # -- terminal check ----------------------------------------------------
    def at_end(self) -> str:
        """TRUE iff claim held AND the cursor landed exactly on the
        container's end (never NULL)."""
        return (f"COALESCE({self.ok} AND {self.pos} = LENGTH({self.h})+1, "
                f"FALSE)")


def coin_amt(coin: str) -> str:
    """Claimed canonical Coin{denom=1,amount=2} → amount as bigint.
    NULL = claim fail.  The amount must be 1-18 ASCII digits (hex
    pairs 30-39) — the walker's canonical-digit + int64 gate;
    negatives and 19+ digit amounts go to the tail."""
    c = Cur(coin)
    _denom, c1 = c.ld(1)
    amt_b, c2 = c1.ld(2)
    return (f"(CASE WHEN {c2.at_end()} "
            f"AND HEX({amt_b}) RLIKE '^(3[0-9]){{1,18}}$' "
            f"THEN CAST(DECODE({amt_b}, 'UTF-8') AS BIGINT) END)")


def any_unwrap(payload: str, url_hex: str) -> str:
    """Claimed canonical Any{type_url=1,value=2} with EXACT url
    ``url_hex`` → inner value hex; NULL on any deviation."""
    c = Cur(payload)
    u, c1 = c.ld(1)
    v, c2 = c1.ld(2)
    return (f"(CASE WHEN {c2.at_end()} AND {u} = X'{url_hex}' "
            f"THEN {v} END)")


def _skip(cur: Cur, *fnos: int) -> Cur:
    for f in fnos:
        _, cur = cur.ld(f)
    return cur


def _take(cur: Cur, fno: int) -> str:
    p, c2 = cur.ld(fno)
    return f"(CASE WHEN COALESCE({c2.ok}, FALSE) THEN {p} END)"


def _mid(cur: Cur) -> str:
    """Bindable resume position: NULL on any claim failure so far."""
    return f"(CASE WHEN COALESCE({cur.ok}, FALSE) THEN {cur.pos} END)"


# the slot-free arm subset: types whose positional scan needs no bound
# nested payloads — the profile a 1 GiB driver session can ANALYZE
# (the full 37-arm chain's Catalyst analysis transiently OOMs a vanilla
# session; measured through the driver-style smoke)
HEAD_TYPES = frozenset((
    "send", "delegate", "undelegate", "perm_locked", "withdraw",
    "set_withdraw", "revoke_allow", "unjail", "withdraw_comm", "revoke",
    "verify_invariant", "vote", "deposit", "vesting", "cancel_unbond",
    "fund_pool", "redelegate", "exec", "transfer", "instantiate",
    "gov_v1_vote", "gov_v1_deposit",
    # r11 group-module slot-free arms (strings + varints only)
    "group_upd_admin", "group_upd_metadata", "group_policy_admin",
    "group_policy_metadata", "group_withdraw", "group_exec",
    "group_vote", "group_leave",
    # r12 slot-free arm (three strings, the revoke shape)
    "chan_close_init",
))


def add_positional_decode(df: DataFrame, blob: str, urls: dict,
                          carry: list[str] | None = None,
                          head_only: bool = False) -> DataFrame:
    """Append ``__rp_d`` — the claimed positional registry decode of
    hex column ``blob`` — to ``df``.  NULL ``__rp_d`` = unclaimed:
    route the row to the Python tail.  ``urls`` is the keyword →
    type-url table shared with the Python mirror
    (tx_decode._REGISTRY_URL_KEYS), so the dispatch tables cannot
    drift.

    Five chained ``selectExpr`` projections: Any unwrap → slots
    (nested payloads + resume positions + pids) → second-level slots
    (inner-Any bodies, packet mid-position) → the 37-arm dispatch
    CASE.  Runs best with whole-stage codegen OFF for the
    materialization (per-operator UnsafeProjection splits CaseWhen
    branches into methods, SPARK-22543; whole-stage cannot split
    around operator-local variables)."""
    if carry is None:
        carry = list(df.columns)
    uh = {k: v.encode().hex().upper() for k, v in urls.items()}
    included = HEAD_TYPES if head_only else None

    # The projections are COLLECTED and assembled into one nested SQL
    # query: a chain of ten selectExpr calls re-analyzes the whole
    # upstream plan per call (quadratic transient churn that OOM'd a
    # vanilla 1 GiB driver during the r10 smoke), while one spark.sql
    # over nested subselects is a single analysis pass.
    class _Layers:
        def __init__(self, columns):
            self.columns = list(columns)
            self.layers: list[list[str]] = []

        def selectExpr(self, *exprs):
            self.layers.append(list(exprs))
            return self

    real_df = df
    df = _Layers(df.columns)

    def _filt(m: dict) -> dict:
        if included is None:
            return m
        return {k: v for k, v in m.items() if k in included}

    # ---- S0/S1: hex → binary once, then the Any unwrap -------------------
    df = df.selectExpr(*carry, f"UNHEX({blob}) AS __rp_bin")
    c0 = Cur("__rp_bin")
    u_b, c1 = c0.ld(1)
    v_b, c2 = c1.ld_wide(2)
    any_ok = c2.at_end()
    df = df.selectExpr(
        *carry,
        f"CASE WHEN {any_ok} THEN {u_b} END AS __rp_url",
        f"CASE WHEN {any_ok} THEN {v_b} END AS __rp_body",
    )
    U, B = "__rp_url", "__rp_body"

    def ucase(m: dict[str, str], t: str = "BINARY") -> str:
        m = _filt(m)
        if not m:  # head-only profile: the column is simply absent
            return f"CAST(NULL AS {t})"
        arms = " ".join(f"WHEN {U} = X'{uh[k]}' THEN {e}"
                        for k, e in m.items())
        return f"(CASE {arms} END)"

    # ---- S2: first-level slots, resume positions, pids -------------------
    def vs_mid() -> Cur:
        """(varint pid, string) prefix shared by the gov-ish types."""
        _, cv = Cur(B).vi(1, 5)
        return _skip(cv, 2)

    slot1 = ucase({
        "grant": _take(_skip(Cur(B), 1, 2), 3),
        "authz_exec": _take(_skip(Cur(B), 1), 2),
        "grant_allow": _take(_skip(Cur(B), 1, 2), 3),
        "create_val": _take(Cur(B), 1),
        "edit_val": _take(Cur(B), 1),
        "vote_weighted": _take(vs_mid(), 3),
        "submit_proposal": _take(Cur(B), 1),
        "update_client": _take(_skip(Cur(B), 1), 2),
        "recv_packet": _take(Cur(B), 1),
        "ack": _take(Cur(B), 1),
        "timeout": _take(Cur(B), 1),
        "periodic_vest": _take(_skip(Cur(B), 1, 2).vi(3, 9)[1], 4),
        "gov_v1_submit": _take(Cur(B), 1),
        "multisend": _take(_skip(Cur(B), 1), 2),
        # r11 closure slots
        "submit_evidence": _take(_skip(Cur(B), 1), 2),
        "exec_legacy": _take(Cur(B), 1),
        "group_create": _take(_skip(Cur(B), 1), 2),
        "group_create_with_policy": _take(_skip(Cur(B), 1), 2),
        "group_upd_members":
            _take(_skip(Cur(B), 1).vi(2, 5, False)[1], 3),
        "group_create_policy":
            _take(_skip(_skip(Cur(B), 1).vi(2, 5, False)[1], 3), 4),
        "group_policy_decision": _take(_skip(Cur(B), 1, 2), 3),
        "group_submit": _take(_skip(Cur(B), 1, 2, 3), 4),
        # r12 closure slots: light-client Anys, counterparty/Channel
        # messages, proof Heights, the TimeoutOnClose packet
        "gov_v1_vote_weighted": _take(vs_mid(), 3),
        "create_client": _take(Cur(B), 1),
        "upgrade_client": _take(_skip(Cur(B), 1), 2),
        "submit_misbehaviour": _take(_skip(Cur(B), 1), 2),
        "conn_open_init": _take(_skip(Cur(B), 1), 2),
        "conn_open_try": _take(_skip(Cur(B), 1), 3),
        "conn_open_ack": _take(_skip(Cur(B), 1, 2, 3), 4),
        "conn_open_confirm": _take(_skip(Cur(B), 1, 2), 3),
        "chan_open_init": _take(_skip(Cur(B), 1), 2),
        "chan_open_try": _take(_skip(Cur(B), 1), 3),
        "chan_open_ack": _take(_skip(Cur(B), 1, 2, 3, 4, 5), 6),
        "chan_open_confirm": _take(_skip(Cur(B), 1, 2, 3), 4),
        "chan_close_confirm": _take(_skip(Cur(B), 1, 2, 3), 4),
        "timeout_on_close": _take(Cur(B), 1),
    })
    slot2 = ucase({
        "recv_packet": _take(_skip(Cur(B), 1, 2), 3),
        "ack": _take(_skip(Cur(B), 1, 2, 3), 4),
        "timeout": _take(_skip(Cur(B), 1, 2), 3),
        "multisend": _take(_skip(Cur(B), 1, 2), 2),
        "gov_v1_submit": _take(_skip(Cur(B), 1), 1),
        # group create-with-policy decision Any (field 6, after the
        # member slot, two strings and the as-admin varint)
        "group_create_with_policy":
            _take(_skip(_skip(Cur(B), 1), 2, 3, 4).vi(5, 1, False)[1], 6),
        # r12 closure second-level slots
        "create_client": _take(_skip(Cur(B), 1), 2),
        "upgrade_client": _take(_skip(Cur(B), 1, 2), 3),
        "conn_open_try": _take(_skip(Cur(B), 1, 3), 4),
        "chan_open_try": _take(_skip(Cur(B), 1, 3, 4, 5), 6),
        "timeout_on_close": _take(_skip(Cur(B), 1, 2, 3), 4),
    })
    two_str_mid = _mid(_skip(Cur(B), 1, 2))
    mid = ucase({
        **{k: two_str_mid for k in (
            "send", "delegate", "undelegate", "withdraw", "redelegate",
            "set_withdraw", "transfer", "vesting", "cancel_unbond",
            "perm_locked", "revoke", "revoke_allow", "exec",
            "verify_invariant", "instantiate", "grant", "grant_allow",
            "periodic_vest", "group_policy_admin", "group_policy_metadata",
            "group_policy_decision", "group_submit", "chan_close_init")},
        **{k: _mid(vs_mid()) for k in (
            "vote", "deposit", "vote_weighted", "gov_v1_vote",
            "gov_v1_deposit", "group_vote", "gov_v1_vote_weighted")},
    }, "BIGINT")
    pid_v = Cur(B).vi(1, 5)[0]
    pid2_v = _skip(Cur(B), 1).vi(2, 5)[0]   # group_id after one string
    pidc = ucase({
        **{k: pid_v for k in
           ("vote", "deposit", "vote_weighted", "gov_v1_vote",
            "gov_v1_deposit", "group_withdraw", "group_vote",
            "group_exec", "gov_v1_vote_weighted")},
        **{k: pid2_v for k in
           ("group_upd_members", "group_upd_admin", "group_upd_metadata",
            "group_create_policy", "group_leave")},
    }, "BIGINT")
    df = df.selectExpr(
        *carry, U, B,
        f"{slot1} AS __rp_s1", f"{slot2} AS __rp_s2",
        f"{mid} AS __rp_mid", f"{pidc} AS __rp_pid",
    )
    S1c, S2c = "__rp_s1", "__rp_s2"

    # ---- S3: inner bodies (two-deep Anys / allowance) + packet mid -----
    send_hex = uh["send"]
    pkt_mid = _mid(_skip(Cur(S1c).vi(1, 5, False)[1], 2, 3, 4))
    df = df.selectExpr(
        *carry, U, B, S1c, S2c, "__rp_mid", "__rp_pid",
        ucase({"authz_exec": any_unwrap(S1c, send_hex),
               "gov_v1_submit": any_unwrap(S1c, send_hex),
               "group_submit": any_unwrap(S1c, send_hex),
               "submit_evidence": any_unwrap(S1c, uh["equivocation"]),
               "grant_allow": any_unwrap(S1c, uh["basic_allowance"])})
        + " AS __rp_in1",
        ucase({"gov_v1_submit": any_unwrap(S2c, send_hex)})
        + " AS __rp_in2",
        ucase({"recv_packet": pkt_mid, "ack": pkt_mid,
               "timeout": pkt_mid, "timeout_on_close": pkt_mid},
              "BIGINT") + " AS __rp_pktmid",
    )
    IN1, IN2, MID, PID = "__rp_in1", "__rp_in2", "__rp_mid", "__rp_pid"
    PKTMID = "__rp_pktmid"
    base = [U, B, S1c, S2c, MID, PID, IN1, IN2, PKTMID]

    def m() -> Cur:
        return Cur(B, MID, f"({MID} IS NOT NULL)")

    # ---- S4a/S4b/S4c: coin groups ----------------------------------------
    # Each type's repeated-Coin arrays live in one of three GROUPS
    # (primary / secondary / tertiary), each bound as (container hex,
    # validated start position, then first/second payloads).  Binding
    # these is what keeps the dispatch arms' textual trees small: a
    # coin sum over bound payloads is ~300 B instead of the ~100 KB
    # the composed form measured (13.6 MB dispatch total).
    def cpos(cur: Cur, fno: int) -> str:
        """Start position of the coin array — NULL unless the claim
        held up to here AND the first coin's tag matches."""
        t = cur._tag(fno, 2)
        return (f"(CASE WHEN COALESCE({cur.ok}, FALSE) AND "
                f"COALESCE({t}, FALSE) THEN {cur.pos} END)")

    grp1 = {
        **{k: ("__rp_body", cpos(m(), 3)) for k in (
            "send", "delegate", "undelegate", "perm_locked", "vesting",
            "cancel_unbond", "deposit", "gov_v1_deposit", "transfer")},
        "redelegate": (B, cpos(_skip(m(), 3), 4)),
        "create_val": (B, cpos(_skip(Cur(B).ld_slot(1, S1c), 3, 4, 5), 7)),
        "fund_pool": (B, cpos(Cur(B), 1)),
        "instantiate": (B, cpos(_skip(m().vi(3, 5, False)[1], 4, 5), 6)),
        "submit_proposal": (B, cpos(Cur(B).ld_slot(1, S1c), 2)),
        "multisend": (S1c, cpos(_skip(Cur(S1c), 1), 2)),
        "periodic_vest": (S1c, cpos(Cur(S1c).vi(1, 2, False)[1], 2)),
        "authz_exec": (IN1, cpos(_skip(Cur(IN1), 1, 2), 3)),
        "grant_allow": (IN1, cpos(Cur(IN1), 1)),
        "gov_v1_submit": (IN1, cpos(_skip(Cur(IN1), 1, 2), 3)),
        "group_submit": (IN1, cpos(_skip(Cur(IN1), 1, 2), 3)),
    }
    grp2 = {
        "multisend": (S2c, cpos(_skip(Cur(S2c), 1), 2)),
        "gov_v1_submit": (IN2, cpos(_skip(Cur(IN2), 1, 2), 3)),
    }
    grp3 = {
        "gov_v1_submit":
            (B, cpos(Cur(B).ld_slot(1, S1c).ld_slot(1, S2c), 2)),
    }

    def bindgrp(name: str, g: dict) -> list[str]:
        g = _filt(g)
        ch = ucase({k: v[0] for k, v in g.items()})
        cp = ucase({k: v[1] for k, v in g.items()}, "BIGINT")
        return [f"{ch} AS __rp_{name}h", f"{cp} AS __rp_{name}p"]

    df = df.selectExpr(
        *carry, *base,
        *bindgrp("c", grp1), *bindgrp("d", grp2), *bindgrp("e", grp3),
    )
    gcols = ["__rp_ch", "__rp_cp", "__rp_dh", "__rp_dp",
             "__rp_eh", "__rp_ep"]

    def pay_at(h: str, p: str) -> str:
        # NULL (claim-fail) when the declared length overruns the
        # container: SUBSTRING would silently truncate and the
        # after1/after2 advances (LENGTH of the truncated payload)
        # could land exactly on the container end, claiming a blob
        # the walker fail-closes on (r10 ADVICE: fail-open overrun).
        # ``p`` is always a bound column here, so referencing ``ln``
        # twice stays cheap.
        ln = f"NULLIF(LEAST({_hb(h, f'({p}+1)')}, 128), 128)"
        return (f"(CASE WHEN ({p}+1+{ln}) <= LENGTH({h}) "
                f"THEN SUBSTRING({h}, CAST(({p}+2) AS INT), "
                f"CAST({ln} AS INT)) END)")

    df = df.selectExpr(
        *carry, *base, *gcols,
        f"{pay_at('__rp_ch', '__rp_cp')} AS __rp_c1",
        f"{pay_at('__rp_dh', '__rp_dp')} AS __rp_d1",
        f"{pay_at('__rp_eh', '__rp_ep')} AS __rp_e1",
    )

    def second(h: str, p: str, p1: str) -> str:
        """Second-coin payload: present iff the byte after the first
        coin repeats the first coin's tag."""
        p2 = f"({p}+2+LENGTH({p1}))"
        same = f"({_hb(h, p2)} = {_hb(h, p)})"
        return (f"(CASE WHEN COALESCE({same}, FALSE) "
                f"THEN {pay_at(h, p2)} END)")

    df = df.selectExpr(
        *carry, *base, *gcols, "__rp_c1", "__rp_d1", "__rp_e1",
        f"{second('__rp_ch', '__rp_cp', '__rp_c1')} AS __rp_c2",
        f"{second('__rp_dh', '__rp_dp', '__rp_d1')} AS __rp_d2",
        f"{second('__rp_eh', '__rp_ep', '__rp_e1')} AS __rp_e2",
    )

    class Grp:
        """Accessors over one bound coin group — every reference is a
        column name, so arm trees stay flat."""

        def __init__(self, h, p, c1, c2):
            self.h, self.p, self.c1, self.c2 = h, p, c1, c2
            self.have2 = f"({c2} IS NOT NULL)"

        def sum2(self) -> str:
            """1-or-2 coin sum (walker's poisoning ``_coin_amt_sum``)."""
            return (f"(CASE WHEN {self.have2} "
                    f"THEN ({coin_amt(self.c1)}+{coin_amt(self.c2)}) "
                    f"ELSE {coin_amt(self.c1)} END)")

        def one(self) -> str:
            """Single-coin amount (walker's ``_coin_amt`` of ld[n][0])."""
            return coin_amt(self.c1)

        def after2(self) -> str:
            return (f"(CASE WHEN {self.have2} "
                    f"THEN ({self.p}+4+LENGTH({self.c1})+LENGTH({self.c2}))"
                    f" ELSE ({self.p}+2+LENGTH({self.c1})) END)")

        def after1(self) -> str:
            return f"({self.p}+2+LENGTH({self.c1}))"

        def cur2(self, container: str | None = None) -> Cur:
            return Cur(container or self.h, self.after2(),
                       f"({self.p} IS NOT NULL)")

        def cur1(self, container: str | None = None) -> Cur:
            return Cur(container or self.h, self.after1(),
                       f"({self.p} IS NOT NULL)")

        def end2(self) -> str:
            """Coins close their container (1-or-2 coins)."""
            return self.cur2().at_end()

        def end1(self) -> str:
            return self.cur1().at_end()

    G1 = Grp("__rp_ch", "__rp_cp", "__rp_c1", "__rp_c2")
    G2 = Grp("__rp_dh", "__rp_dp", "__rp_d1", "__rp_d2")
    G3 = Grp("__rp_eh", "__rp_ep", "__rp_e1", "__rp_e2")

    # ---- S4d: bind the coin SUMS once (group-generic, not per-type) —
    # and the remaining per-arm expressions stay under Janino's 64 KB
    # per-method limit, which the one-big-CASE dispatch blew (silent
    # InterpretedUnsafeProjection fallback measured at ~600 µs/row)
    pcols = ["__rp_c1", "__rp_d1", "__rp_e1", "__rp_c2", "__rp_d2",
             "__rp_e2"]
    df = df.selectExpr(
        *carry, *base, *gcols, *pcols,
        f"{G1.sum2()} AS __rp_cs1",
        f"{G1.one()} AS __rp_c1a",
        f"{G2.sum2()} AS __rp_cs2",
        f"{G3.sum2()} AS __rp_cs3",
    )
    CS1, C1A, CS2, CS3 = "__rp_cs1", "__rp_c1a", "__rp_cs2", "__rp_cs3"

    # ---- S5a: one bound column per dispatch arm ---------------------------
    def out(key: str, claim: str, amt: str | None = None,
            pid: str | None = None, yes: str | None = None,
            tout: str | None = None) -> str:
        parts = [f"{U} = X'{uh[key]}'", claim]
        for x in (amt, pid, yes, tout):
            if x is not None:
                parts.append(f"{x} IS NOT NULL")
        z = "CAST(0 AS BIGINT)"
        vals = [f"COALESCE({x}, {z})" if x is not None else z
                for x in (amt, pid, yes, tout)]
        return (f"(CASE WHEN {' AND '.join(parts)} THEN "
                f"NAMED_STRUCT('type_url', '{urls[key]}', "
                f"'status', 'ok', 'amt', {vals[0]}, 'pid', {vals[1]}, "
                f"'yes', {vals[2]}, 'timeout', {vals[3]}) END)")

    def yes01(v: str) -> str:
        return (f"(CASE WHEN {v} = 1 THEN CAST(1 AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END)")

    arms: dict[str, str] = {}

    # send-family — (s, s, coins) closing the body
    for k in ("send", "delegate", "undelegate", "perm_locked"):
        arms[k] = out(k, G1.cur2(B).at_end(), amt=CS1)

    # wasm execute — JSON amount, claimed to the canonical shape
    jp, ce = m().ld(3)
    js = f"DECODE({jp}, 'UTF-8')"
    # ANSI decode THROWS on invalid UTF-8 — gate on IS_VALID_UTF8 so a
    # garbage payload claim-fails to the tail instead of killing the
    # query (the r9 ADVICE fail-closed discipline)
    j_ok = (f"(CASE WHEN {jp} IS NOT NULL AND IS_VALID_UTF8({jp}) "
            f"THEN COALESCE({js} RLIKE "
            "'^\\\\{\"transfer\":\\\\{\"amount\":\"[0-9]{1,18}\"\\\\}\\\\}$'"
            ", FALSE) ELSE FALSE END)")
    arms["exec"] = out(
        "exec", f"({ce.at_end()} AND {j_ok})",
        amt=f"CAST(GET_JSON_OBJECT({js}, '$.transfer.amount') AS BIGINT)")

    # vote / gov_v1_vote — pid + option (+ v1 metadata)
    yv, ce = m().vi(3, 1)
    arms["vote"] = out("vote", ce.at_end(), pid=PID, yes=yes01(yv))
    yv2, cv2 = m().vi(3, 1)
    _meta, ce2 = cv2.ld(4)
    arms["gov_v1_vote"] = out("gov_v1_vote", ce2.at_end(), pid=PID,
                              yes=yes01(yv2))

    # IBC transfer — coins + route strings + 5-byte timeout varint
    tv, ce = _skip(G1.cur2(B), 4, 5).vi(7, 9)
    arms["transfer"] = out("transfer", ce.at_end(), amt=CS1, tout=tv)

    # two-string bodies
    for k in ("withdraw", "set_withdraw", "revoke_allow"):
        arms[k] = out(k, m().at_end())

    # redelegate — (s, s, s, single coin)
    arms["redelegate"] = out("redelegate", G1.cur1(B).at_end(), amt=C1A)

    # deposit / gov_v1_deposit — pid + coins
    for k in ("deposit", "gov_v1_deposit"):
        arms[k] = out(k, G1.cur2(B).at_end(), amt=CS1, pid=PID)

    # authz grant — nested Grant{Any(StakeAuthorization)}
    ga_any = _take(Cur(S1c), 1)
    ga_ok = f"({any_unwrap(ga_any, uh['stake_auth'])} IS NOT NULL)"
    g_exact = _skip(Cur(S1c), 1).at_end()
    arms["grant"] = out(
        "grant",
        f"({m().ld_slot(3, S1c).at_end()} AND {g_exact} AND {ga_ok})")

    # authz exec — inner MsgSend coins (two-deep Any)
    top_end = _skip(Cur(B), 1).ld_slot(2, S1c).at_end()
    arms["authz_exec"] = out(
        "authz_exec", f"({top_end} AND {G1.end2()})", amt=CS1)

    # revoke / verify_invariant — three strings
    for k in ("revoke", "verify_invariant"):
        arms[k] = out(k, _skip(m(), 3).at_end())

    # feegrant allowance — BasicAllowance coins (two-deep Any)
    arms["grant_allow"] = out(
        "grant_allow",
        f"({m().ld_slot(3, S1c).at_end()} AND {G1.end2()})",
        amt=CS1)

    # unjail / withdraw_commission — one string
    for k in ("unjail", "withdraw_comm"):
        arms[k] = out(k, _skip(Cur(B), 1).at_end())

    # validator create/edit — Description slot (claimed 1-field)
    d_exact = _skip(Cur(S1c), 1).at_end()
    arms["create_val"] = out(
        "create_val", f"({G1.cur1(B).at_end()} AND {d_exact})", amt=C1A)
    arms["edit_val"] = out(
        "edit_val",
        f"({_skip(Cur(B).ld_slot(1, S1c), 2, 3, 4).at_end()} "
        f"AND {d_exact})")

    # vesting / cancel_unbond — coins + trailing varint
    tv, ce = G1.cur2(B).vi(4, 9)
    arms["vesting"] = out("vesting", ce.at_end(), amt=CS1, tout=tv)
    tv, ce = G1.cur1(B).vi(4, 9)
    arms["cancel_unbond"] = out("cancel_unbond", ce.at_end(), amt=C1A,
                                tout=tv)

    # multisend — o1 (shape-checked: exactly one coin) + o2 (1-2 coins)
    ms_end = _skip(Cur(B), 1).ld_slot(2, S1c).ld_slot(2, S2c).at_end()
    arms["multisend"] = out(
        "multisend",
        f"({ms_end} AND {G1.end1()} AND {G2.end2()})",
        amt=f"({C1A}+{CS2})")

    # fund_pool — (coin, s)
    arms["fund_pool"] = out("fund_pool", _skip(G1.cur1(B), 2).at_end(),
                            amt=C1A)

    # vote_weighted — nested WeightedVoteOption
    wv, wc = Cur(S1c).vi(1, 1)
    w_end = _skip(wc, 2).at_end()
    arms["vote_weighted"] = out(
        "vote_weighted",
        f"({m().ld_slot(3, S1c).at_end()} AND {w_end})",
        pid=PID, yes=f"(CASE WHEN {w_end} THEN {yes01(wv)} END)")

    # submit_proposal — TextProposal content Any + deposit coins
    ca_ok = f"({any_unwrap(S1c, uh['text_proposal'])} IS NOT NULL)"
    arms["submit_proposal"] = out(
        "submit_proposal",
        f"({_skip(G1.cur2(B), 3).at_end()} AND {ca_ok})", amt=CS1)

    # update_client — TM header Any
    h_ok = f"({any_unwrap(S1c, uh['tm_header'])} IS NOT NULL)"
    arms["update_client"] = out(
        "update_client",
        f"({_skip(Cur(B), 1).ld_slot(2, S1c).at_end()} AND {h_ok})")

    # IBC packet family — packet timeout resumes from the bound mid
    def pkt_tail() -> tuple[str, str]:
        pc = Cur(S1c, PKTMID, f"({PKTMID} IS NOT NULL)")
        tv, pe = _skip(pc, 5, 6).vi(8, 9)
        return tv, pe.at_end()

    def height_ok(slot: str) -> str:
        _, h1 = Cur(slot).vi(1, 5, False)
        _, h2 = h1.vi(2, 9, False)
        return h2.at_end()

    tv, p_end = pkt_tail()
    cx = _skip(Cur(B).ld_slot(1, S1c), 2).ld_slot(3, S2c)
    arms["recv_packet"] = out(
        "recv_packet",
        f"({_skip(cx, 4).at_end()} AND {p_end} AND {height_ok(S2c)})",
        tout=f"(CASE WHEN {p_end} THEN {tv} END)")
    tv, p_end = pkt_tail()
    cx = _skip(Cur(B).ld_slot(1, S1c), 2, 3).ld_slot(4, S2c)
    arms["ack"] = out(
        "ack",
        f"({_skip(cx, 5).at_end()} AND {p_end} AND {height_ok(S2c)})",
        tout=f"(CASE WHEN {p_end} THEN {tv} END)")
    tv, p_end = pkt_tail()
    cx = _skip(Cur(B).ld_slot(1, S1c), 2).ld_slot(3, S2c)
    _nsr, cx2 = cx.vi(4, 9, False)
    arms["timeout"] = out(
        "timeout",
        f"({_skip(cx2, 5).at_end()} AND {p_end} AND {height_ok(S2c)})",
        tout=f"(CASE WHEN {p_end} THEN {tv} END)")

    # periodic vesting — start_time + one Period(single coin)
    p_exact = G1.end1()
    tv3, cx = m().vi(3, 9)
    arms["periodic_vest"] = out(
        "periodic_vest",
        f"({cx.ld_slot(4, S1c).at_end()} AND {p_exact})",
        amt=C1A, tout=tv3)

    # wasm instantiate — code_id varint + json + funds coins
    arms["instantiate"] = out("instantiate", G1.cur2(B).at_end(),
                              amt=CS1)

    # gov v1 submit — two embedded MsgSends + deposit coins
    top_end = _skip(G3.cur2(B), 3).at_end()
    arms["gov_v1_submit"] = out(
        "gov_v1_submit",
        f"({top_end} AND {G1.end2()} AND {G2.end2()})",
        amt=f"({CS1}+{CS2}+{CS3})")

    # ---- r11 closure: evidence / legacy-content exec / group ---------
    # submit_evidence — Equivocation Any: height + power varints,
    # consensus address string
    se_top = _skip(Cur(B), 1).ld_slot(2, S1c).at_end()
    ec = Cur(IN1)
    se_tv, ec1 = ec.vi(1, 5)
    se_av, ec2 = ec1.vi(3, 5)
    se_end = _skip(ec2, 4).at_end()
    arms["submit_evidence"] = out(
        "submit_evidence", f"({se_top} AND {se_end})",
        amt=se_av, tout=se_tv)

    # exec_legacy — TextProposal content Any + authority string
    el_ok = f"({any_unwrap(S1c, uh['text_proposal'])} IS NOT NULL)"
    arms["exec_legacy"] = out(
        "exec_legacy",
        f"({_skip(Cur(B).ld_slot(1, S1c), 2).at_end()} AND {el_ok})")

    # group module. MemberRequest slot = (address, weight, metadata)
    gm_end = _skip(Cur(S1c), 1, 2, 3).at_end()
    arms["group_create"] = out(
        "group_create",
        f"({_skip(_skip(Cur(B), 1).ld_slot(2, S1c), 3).at_end()} "
        f"AND {gm_end})")
    arms["group_upd_members"] = out(
        "group_upd_members",
        f"({_skip(Cur(B), 1).vi(2, 5, False)[1].ld_slot(3, S1c).at_end()}"
        f" AND {gm_end})",
        pid=PID)
    for k in ("group_upd_admin", "group_upd_metadata"):
        arms[k] = out(
            k, _skip(_skip(Cur(B), 1).vi(2, 5, False)[1], 3).at_end(),
            pid=PID)
    thr_ok = f"({any_unwrap(S1c, uh['threshold_policy'])} IS NOT NULL)"
    gcp_end = (_skip(_skip(Cur(B), 1).vi(2, 5, False)[1], 3)
               .ld_slot(4, S1c).at_end())
    arms["group_create_policy"] = out(
        "group_create_policy", f"({gcp_end} AND {thr_ok})", pid=PID)
    thr2_ok = f"({any_unwrap(S2c, uh['threshold_policy'])} IS NOT NULL)"
    gcwp_yv, gcwp_c = (_skip(_skip(Cur(B), 1).ld_slot(2, S1c), 3, 4)
                       .vi(5, 1))
    arms["group_create_with_policy"] = out(
        "group_create_with_policy",
        f"({gcwp_c.ld_slot(6, S2c).at_end()} AND {gm_end} AND {thr2_ok})",
        yes=yes01(gcwp_yv))
    for k in ("group_policy_admin", "group_policy_metadata"):
        arms[k] = out(k, _skip(m(), 3).at_end())
    arms["group_policy_decision"] = out(
        "group_policy_decision",
        f"({m().ld_slot(3, S1c).at_end()} AND {thr_ok})")
    gs_end = _skip(m(), 3).ld_slot(4, S1c).vi(5, 1, False)[1].at_end()
    arms["group_submit"] = out(
        "group_submit", f"({gs_end} AND {G1.end2()})", amt=CS1)
    for k in ("group_withdraw", "group_exec"):
        arms[k] = out(k, _skip(Cur(B).vi(1, 5, False)[1], 2).at_end(),
                      pid=PID)
    gv_yv, gv_c = m().vi(3, 1)
    arms["group_vote"] = out(
        "group_vote", _skip(gv_c, 4).vi(5, 1, False)[1].at_end(),
        pid=PID, yes=yes01(gv_yv))
    arms["group_leave"] = out(
        "group_leave", _skip(Cur(B), 1).vi(2, 5, False)[1].at_end(),
        pid=PID)

    # ---- r12 closure: gov v1 vote-weighted + IBC core handshakes ----
    # gov v1 vote-weighted — the v1beta1 shape + a metadata string
    vw1_end = _skip(m().ld_slot(3, S1c), 4).at_end()
    arms["gov_v1_vote_weighted"] = out(
        "gov_v1_vote_weighted", f"({vw1_end} AND {w_end})",
        pid=PID, yes=f"(CASE WHEN {w_end} THEN {yes01(wv)} END)")

    # light-client Any claims (exact url, canonical encoding)
    cs_ok = f"({any_unwrap(S1c, uh['client_state'])} IS NOT NULL)"
    cons2_ok = f"({any_unwrap(S2c, uh['consensus_state'])} IS NOT NULL)"
    misb_ok = f"({any_unwrap(S1c, uh['misbehaviour'])} IS NOT NULL)"
    arms["create_client"] = out(
        "create_client",
        f"({_skip(Cur(B).ld_slot(1, S1c).ld_slot(2, S2c), 3).at_end()}"
        f" AND {cs_ok} AND {cons2_ok})")
    arms["upgrade_client"] = out(
        "upgrade_client",
        f"({_skip(_skip(Cur(B), 1).ld_slot(2, S1c).ld_slot(3, S2c), 4, 5, 6).at_end()}"
        f" AND {cs_ok} AND {cons2_ok})")
    arms["submit_misbehaviour"] = out(
        "submit_misbehaviour",
        f"({_skip(_skip(Cur(B), 1).ld_slot(2, S1c), 3).at_end()}"
        f" AND {misb_ok})")

    def height_tv(slot: str) -> tuple[str, str]:
        """(revision_height value, exact-end claim) over a bound
        proof-Height slot — the walker's timeout source for the
        handshake confirms."""
        _h1, h1c = Cur(slot).vi(1, 5, False)
        tv, h2c = h1c.vi(2, 9)
        return tv, h2c.at_end()

    # connection handshake
    coi_cp_end = _skip(Cur(S1c), 1, 2).at_end()
    coi_tv, coi_c = _skip(_skip(Cur(B), 1).ld_slot(2, S1c), 3).vi(4, 5)
    arms["conn_open_init"] = out(
        "conn_open_init",
        f"({_skip(coi_c, 5).at_end()} AND {coi_cp_end})", tout=coi_tv)
    cot_cp_end = _skip(Cur(S2c), 1, 2).at_end()
    cot_tv, cot_c = (_skip(Cur(B), 1).ld_slot(3, S1c)
                     .ld_slot(4, S2c).vi(5, 5))
    arms["conn_open_try"] = out(
        "conn_open_try",
        f"({_skip(cot_c, 7, 8, 12).at_end()} AND {cs_ok} "
        f"AND {cot_cp_end})",
        tout=cot_tv)
    arms["conn_open_ack"] = out(
        "conn_open_ack",
        f"({_skip(_skip(Cur(B), 1, 2, 3).ld_slot(4, S1c), 5, 6, 10).at_end()}"
        f" AND {cs_ok})")
    coc_tv, coc_end = height_tv(S1c)
    arms["conn_open_confirm"] = out(
        "conn_open_confirm",
        f"({_skip(_skip(Cur(B), 1, 2).ld_slot(3, S1c), 4).at_end()}"
        f" AND {coc_end})",
        tout=f"(CASE WHEN {coc_end} THEN {coc_tv} END)")

    def channel_claim(slot: str) -> tuple[str, str]:
        """(state enum value, exact-end claim) over a bound Channel
        slot — state + ordering varints, counterparty, version."""
        sv, c1 = Cur(slot).vi(1, 1)
        _o, c2 = c1.vi(2, 1, False)
        return sv, _skip(c2, 3, 5).at_end()

    # channel handshake
    chi_sv, chi_end = channel_claim(S1c)
    arms["chan_open_init"] = out(
        "chan_open_init",
        f"({_skip(_skip(Cur(B), 1).ld_slot(2, S1c), 3).at_end()}"
        f" AND {chi_end})",
        yes=f"(CASE WHEN {chi_end} THEN {yes01(chi_sv)} END)")
    cht_sv, cht_end = channel_claim(S1c)
    cht_tv, cht_hend = height_tv(S2c)
    arms["chan_open_try"] = out(
        "chan_open_try",
        f"({_skip(_skip(_skip(Cur(B), 1).ld_slot(3, S1c), 4, 5).ld_slot(6, S2c), 7).at_end()}"
        f" AND {cht_end} AND {cht_hend})",
        yes=f"(CASE WHEN {cht_end} THEN {yes01(cht_sv)} END)",
        tout=f"(CASE WHEN {cht_hend} THEN {cht_tv} END)")
    cha_tv, cha_hend = height_tv(S1c)
    arms["chan_open_ack"] = out(
        "chan_open_ack",
        f"({_skip(_skip(Cur(B), 1, 2, 3, 4, 5).ld_slot(6, S1c), 7).at_end()}"
        f" AND {cha_hend})",
        tout=f"(CASE WHEN {cha_hend} THEN {cha_tv} END)")
    for k in ("chan_open_confirm", "chan_close_confirm"):
        chc_tv, chc_hend = height_tv(S1c)
        arms[k] = out(
            k,
            f"({_skip(_skip(Cur(B), 1, 2, 3).ld_slot(4, S1c), 5).at_end()}"
            f" AND {chc_hend})",
            tout=f"(CASE WHEN {chc_hend} THEN {chc_tv} END)")
    arms["chan_close_init"] = out(
        "chan_close_init", _skip(m(), 3).at_end())
    toc_tv, toc_pend = pkt_tail()
    toc_hv, toc_hend = height_tv(S2c)
    toc_c = (_skip(Cur(B).ld_slot(1, S1c), 2, 3)
             .ld_slot(4, S2c).vi(5, 9, False)[1])
    arms["timeout_on_close"] = out(
        "timeout_on_close",
        f"({_skip(toc_c, 6).at_end()} AND {toc_pend} AND {toc_hend})",
        tout=f"(CASE WHEN {toc_pend} THEN {toc_tv} END)")

    # unknown: registered-free, UTF-8-valid urls are CLAIMED with the
    # walker's fallthrough tuple (url, 'Unknown message type', zeros)
    url_str = f"DECODE({U}, 'UTF-8')"
    # IS_VALID_UTF8 instead of an encode-roundtrip: ANSI decode throws
    # on ill-formed bytes, and the Python twin's strict .decode() None
    # maps to claim-fail → tail
    utf8_ok = f"IS_VALID_UTF8({U})"
    z = "CAST(0 AS BIGINT)"
    not_reg = " AND ".join(f"{U} != X'{uh[k]}'" for k in arms)
    unknown = (f"(CASE WHEN {U} IS NOT NULL AND ({not_reg}) "
               f"AND COALESCE({utf8_ok}, FALSE) "
               f"THEN NAMED_STRUCT('type_url', {url_str}, "
               f"'status', 'Unknown message type', "
               f"'amt', {z}, 'pid', {z}, 'yes', {z}, 'timeout', {z}) END)")

    arms = _filt(arms)
    arm_cols = [f"CAST({a} AS {_D_TYPE}) AS __rp_a{i}"
                for i, a in enumerate(arms.values())]
    arm_cols.append(f"CAST({unknown} AS {_D_TYPE}) "
                    f"AS __rp_a{len(arms)}")
    df = df.selectExpr(*carry, *arm_cols)

    # ---- S5b: coalesce the disjoint arms ----------------------------------
    names = ", ".join(f"__rp_a{i}" for i in range(len(arms) + 1))
    df.selectExpr(*carry, f"COALESCE({names}) AS __rp_d")

    # ---- assemble + run as ONE query ---------------------------------------
    import uuid

    vname = f"__rp_in_{uuid.uuid4().hex[:10]}"
    real_df.createOrReplaceTempView(vname)
    sql = f"SELECT * FROM {vname}"
    for layer in df.layers:
        cols = ",\n  ".join(layer)
        sql = f"SELECT {cols}\nFROM (\n{sql}\n)"
    spark = real_df.sparkSession
    out = spark.sql(sql)
    # the resolved plan no longer needs the view
    spark.catalog.dropTempView(vname)
    return out
