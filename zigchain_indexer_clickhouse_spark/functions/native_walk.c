/* Native registry decode kernel — the Arrow-batch VOLUME path.
 *
 * A line-for-line port of functions/protobuf_py.py (walk +
 * registry_decode_py): same fail-closed wire rules (1-2 byte tags,
 * wire types 0/1/2/5, 1-9 byte varints, exact cursor landing,
 * max_fields budgets, proto3 last-wins scalars, repeated payloads in
 * wire order), same dispatch semantics per type.  Operates DIRECTLY
 * on the hex-encoded blob column as it sits in the Arrow string
 * buffer (offsets + data, zero copy from the JVM): each wire byte is
 * two hex chars, decoded inline.
 *
 * Rows the kernel cannot decide bit-identically to the Python walker
 * set needs_py and are re-decoded row-by-row in Python:
 *   - wasm MsgExecuteContract (kind 1): the amount lives inside a
 *     JSON document; Python's json.loads semantics (whitespace,
 *     escapes, duplicate keys, int() coercions) are not worth
 *     reimplementing for 1/40th of rows.
 *   - any int64 overflow in a coin sum (Python ints are unbounded).
 *   - malformed hex / NULL input (the Python path raises the same
 *     error the row would have raised there).
 *
 * Reference anchor: src/utils/decoder.js:12-29 — cosmjs decodeTxRaw +
 * registry.decode; this kernel is that per-type dispatch compiled to
 * machine code behind the Arrow batch interface.
 */

#include <stdint.h>
#include <string.h>

#define MAXSTEP 9

typedef struct {
    int64_t off;  /* INPUT-UNIT offset into the data buffer */
    int64_t len;  /* in wire BYTES; -1 = absent */
} slice_t;

typedef struct {
    int n;      /* parsed steps */
    int ok;
    int fno[MAXSTEP];
    int wt[MAXSTEP];
    slice_t ld[MAXSTEP];     /* wt=2 payloads */
    uint64_t vi[MAXSTEP];    /* wt 0/1/5 values */
} walk_t;

static const int8_t HEXV[256] = {
    /* -1 everywhere except 0-9 a-f A-F */
    [0 ... 255] = -1,
    ['0'] = 0, ['1'] = 1, ['2'] = 2, ['3'] = 3, ['4'] = 4,
    ['5'] = 5, ['6'] = 6, ['7'] = 7, ['8'] = 8, ['9'] = 9,
    ['a'] = 10, ['b'] = 11, ['c'] = 12, ['d'] = 13, ['e'] = 14,
    ['f'] = 15,
    ['A'] = 10, ['B'] = 11, ['C'] = 12, ['D'] = 13, ['E'] = 14,
    ['F'] = 15,
};

/* input unit width: 2 = hex chars per wire byte, 1 = raw binary.
 * Set once per batch call; python workers are single-threaded. */
static int g_unit = 2;

/* byte i (wire) of a region; -1 on invalid hex */
static inline int hb(const uint8_t *h, int64_t off, int64_t i)
{
    if (g_unit == 1)
        return h[off + i];
    int hi = HEXV[h[off + 2 * i]];
    int lo = HEXV[h[off + 2 * i + 1]];
    if (hi < 0 || lo < 0)
        return -1;
    return (hi << 4) | lo;
}

/* mirrors protobuf_py.walk(data, max_fields); data = hex region.
 * Returns 0 on bad hex (caller flags needs_py). */
static int walk(const uint8_t *h, int64_t off, int64_t nbytes,
                int max_fields, walk_t *w)
{
    int64_t pos = 0;
    int steps = 0;
    w->n = 0;
    w->ok = 0;
    while (pos < nbytes) {
        steps += 1;
        if (steps > max_fields)
            return 1; /* ok stays 0, partial steps kept */
        int t0 = hb(h, off, pos);
        if (t0 < 0)
            return 0;
        int64_t tag;
        if (t0 < 128) {
            tag = t0;
            pos += 1;
        } else {
            if (pos + 2 > nbytes)
                return 1;
            int t1 = hb(h, off, pos + 1);
            if (t1 < 0)
                return 0;
            if (t1 >= 128)
                return 1; /* 3-byte tag */
            tag = (t0 & 0x7F) | ((int64_t)t1 << 7);
            pos += 2;
        }
        if (pos >= nbytes)
            return 1; /* tag with no field bytes */
        int fno = (int)(tag >> 3), wt = (int)(tag & 7);
        if (fno < 1)
            return 1;
        if (wt == 0 || wt == 2) {
            uint64_t v = 0;
            int shift = 0;
            int64_t i = pos;
            for (;;) {
                if (i >= nbytes || i - pos >= 9)
                    return 1;
                int b = hb(h, off, i);
                if (b < 0)
                    return 0;
                v |= ((uint64_t)(b & 0x7F)) << shift;
                shift += 7;
                i += 1;
                if (b < 128)
                    break;
            }
            if (v > (uint64_t)INT64_MAX)
                return 1;
            if (wt == 0) {
                w->fno[w->n] = fno;
                w->wt[w->n] = 0;
                w->vi[w->n] = v;
                w->n += 1;
                pos = i;
            } else {
                if (i + (int64_t)v > nbytes)
                    return 1;
                w->fno[w->n] = fno;
                w->wt[w->n] = 2;
                w->ld[w->n].off = off + g_unit * i;
                w->ld[w->n].len = (int64_t)v;
                w->n += 1;
                pos = i + (int64_t)v;
            }
        } else if (wt == 5) {
            if (pos + 4 > nbytes)
                return 1;
            uint64_t v = 0;
            for (int j = 3; j >= 0; j--) {
                int b = hb(h, off, pos + j);
                if (b < 0)
                    return 0;
                v = (v << 8) | (uint64_t)b;
            }
            w->fno[w->n] = fno;
            w->wt[w->n] = 5;
            w->vi[w->n] = v;
            w->n += 1;
            pos += 4;
        } else if (wt == 1) {
            if (pos + 8 > nbytes)
                return 1;
            int top = hb(h, off, pos + 7);
            if (top < 0)
                return 0;
            if (top >= 128)
                return 1;
            uint64_t v = 0;
            for (int j = 7; j >= 0; j--) {
                int b = hb(h, off, pos + j);
                if (b < 0)
                    return 0;
                v = (v << 8) | (uint64_t)b;
            }
            w->fno[w->n] = fno;
            w->wt[w->n] = 1;
            w->vi[w->n] = v;
            w->n += 1;
            pos += 8;
        } else {
            return 1; /* wt 3/4/6/7 */
        }
    }
    w->ok = (pos == nbytes);
    return 1;
}

/* ---- step-map accessors (ld: wire order; vi: last occurrence wins) -- */

static slice_t l_nth(const walk_t *w, int fno, int k)
{
    int seen = 0;
    for (int i = 0; i < w->n; i++)
        if (w->wt[i] == 2 && w->fno[i] == fno) {
            if (seen == k)
                return w->ld[i];
            seen++;
        }
    slice_t s = { 0, -1 };
    return s;
}

static int ld_count(const walk_t *w, int fno)
{
    int c = 0;
    for (int i = 0; i < w->n; i++)
        if (w->wt[i] == 2 && w->fno[i] == fno)
            c++;
    return c;
}

static int has_ld(const walk_t *w, int fno)
{
    return ld_count(w, fno) > 0;
}

static int vi_get(const walk_t *w, int fno, uint64_t *out)
{
    int found = 0;
    for (int i = 0; i < w->n; i++)
        if (w->wt[i] != 2 && w->fno[i] == fno) {
            *out = w->vi[i];
            found = 1; /* keep scanning: last wins */
        }
    return found;
}

/* ---- Coin helpers (exact mirrors of _coin_amt / _coin_amt_sum) ------ */

/* _coin_amt: Coin{denom=1, amount=2} -> int64 amount.
 * Returns: 1 = value in *out, 0 = None, -1 = needs_py (int64 edge). */
static int coin_amt(const uint8_t *h, slice_t coin, int64_t *out)
{
    if (coin.len < 0)
        return 0;
    walk_t w;
    if (!walk(h, coin.off, coin.len, 2, &w))
        return -1; /* bad hex */
    if (!w.ok)
        return 0;
    slice_t amt = l_nth(&w, 2, 0);
    if (amt.len < 0)
        return 0;
    /* canonical digits: optional '-', then 1+ digits (the Python
     * regex -?[0-9]+ fullmatch), then int64 range check */
    if (amt.len == 0)
        return 0;
    int64_t i = 0;
    int neg = 0;
    int c0 = hb(h, amt.off, 0);
    if (c0 < 0)
        return -1;
    if (c0 == '-') {
        neg = 1;
        i = 1;
        if (amt.len == 1)
            return 0;
    }
    uint64_t v = 0;
    for (; i < amt.len; i++) {
        int c = hb(h, amt.off, i);
        if (c < '0' || c > '9')
            return 0;
        if (v > ((uint64_t)INT64_MAX + (neg ? 1 : 0) - (c - '0')) / 10) {
            /* exceeds int64 range -> Python returns None only OUTSIDE
             * [-2^63, 2^63); at exactly the boundary arithmetic gets
             * subtle — hand the row to Python */
            return -1;
        }
        v = v * 10 + (uint64_t)(c - '0');
    }
    if (!neg && v > (uint64_t)INT64_MAX)
        return 0;
    if (neg && v > (uint64_t)INT64_MAX + 1)
        return 0;
    *out = neg ? (int64_t)(~v + 1) : (int64_t)v;
    return 1;
}

/* _coin_amt_sum over every wt2 payload of `fno`; poison on any miss.
 * Same return codes as coin_amt; overflow of the SUM -> needs_py
 * (Python ints are unbounded). */
static int coin_sum(const uint8_t *h, const walk_t *w, int fno,
                    int64_t *out)
{
    int cnt = ld_count(w, fno);
    if (cnt == 0)
        return 0; /* _coin_amt_sum(None) -> None */
    int64_t total = 0;
    for (int k = 0; k < cnt; k++) {
        int64_t a;
        int r = coin_amt(h, l_nth(w, fno, k), &a);
        if (r <= 0)
            return r;
        if (__builtin_add_overflow(total, a, &total))
            return -1;
    }
    *out = total;
    return 1;
}

/* ---- the registry type table (indexes must match the Python side:
 * functions/native_registry.py NATIVE_KEYS) ------------------------- */
enum {
    T_SEND, T_EXEC, T_DELEGATE, T_VOTE, T_TRANSFER, T_UNDELEGATE,
    T_WITHDRAW, T_REDELEGATE, T_SET_WITHDRAW, T_DEPOSIT, T_GRANT,
    T_AUTHZ_EXEC, T_REVOKE, T_GRANT_ALLOW, T_REVOKE_ALLOW, T_UNJAIL,
    T_CREATE_VAL, T_EDIT_VAL, T_VESTING, T_MULTISEND, T_CANCEL_UNBOND,
    T_FUND_POOL, T_WITHDRAW_COMM, T_VOTE_WEIGHTED, T_SUBMIT_PROPOSAL,
    T_UPDATE_CLIENT, T_RECV_PACKET, T_PERM_LOCKED, T_PERIODIC_VEST,
    T_INSTANTIATE, T_VERIFY_INVARIANT, T_GOV_V1_VOTE, T_GOV_V1_DEPOSIT,
    T_GOV_V1_SUBMIT, T_ACK, T_TIMEOUT,
    /* r11 closure: evidence, gov v1 legacy-content, group module */
    T_SUBMIT_EVIDENCE, T_EXEC_LEGACY, T_GROUP_CREATE,
    T_GROUP_UPD_MEMBERS, T_GROUP_UPD_ADMIN, T_GROUP_UPD_METADATA,
    T_GROUP_CREATE_POLICY, T_GROUP_CREATE_WITH_POLICY,
    T_GROUP_POLICY_ADMIN, T_GROUP_POLICY_DECISION,
    T_GROUP_POLICY_METADATA, T_GROUP_SUBMIT, T_GROUP_WITHDRAW,
    T_GROUP_VOTE, T_GROUP_EXEC, T_GROUP_LEAVE,
    /* r12 closure: gov v1 vote-weighted + IBC core handshakes */
    T_GOV_V1_VOTE_WEIGHTED, T_CREATE_CLIENT, T_UPGRADE_CLIENT,
    T_SUBMIT_MISBEHAVIOUR, T_CONN_OPEN_INIT, T_CONN_OPEN_TRY,
    T_CONN_OPEN_ACK, T_CONN_OPEN_CONFIRM, T_CHAN_OPEN_INIT,
    T_CHAN_OPEN_TRY, T_CHAN_OPEN_ACK, T_CHAN_OPEN_CONFIRM,
    T_CHAN_CLOSE_INIT, T_CHAN_CLOSE_CONFIRM, T_TIMEOUT_ON_CLOSE,
    /* nested-only urls (never `ok` as top-level messages) */
    T_BASIC_ALLOWANCE, T_STAKE_AUTH, T_TEXT_PROPOSAL, T_TM_HEADER,
    T_EQUIVOCATION, T_THRESHOLD_POLICY, T_CLIENT_STATE,
    T_CONSENSUS_STATE, T_MISBEHAVIOUR,
    T_COUNT
};

/* hex-compare a payload slice against url #id in the packed table */
static int url_is(const uint8_t *h, slice_t s, const uint8_t *urls,
                  const int32_t *uoff, int id)
{
    int32_t ulen = uoff[id + 1] - uoff[id];
    if (s.len != ulen)
        return 0;
    const uint8_t *u = urls + uoff[id];
    for (int64_t i = 0; i < s.len; i++) {
        int b = hb(h, s.off, i);
        if (b < 0 || b != u[i])
            return 0;
    }
    return 1;
}

/* inner walk of an ld slice, with the Python `or b"\xff"` fallback:
 * an ABSENT slice walks a 1-byte 0xff blob (always fails, empty) */
static int walk_or_ff(const uint8_t *h, slice_t s, int maxf, walk_t *w)
{
    if (s.len < 0) {
        w->n = 0;
        w->ok = 0;
        return 1;
    }
    return walk(h, s.off, s.len, maxf, w);
}

/* decode one Any blob: mirrors registry_decode_py.  Outputs:
 *   type_id  : registry index, or -1 (unregistered / missing url)
 *   ok       : 1 = status "ok"
 *   amt/pid/yes/tout : the `x or 0` coalesced tuple fields
 * Returns 0 if the row must go to Python (bad hex / json / overflow). */
static int decode_one(const uint8_t *h, int64_t off, int64_t hexlen,
                      const uint8_t *urls, const int32_t *uoff,
                      int32_t *type_id, uint8_t *ok_out, int64_t *amt_o,
                      int64_t *pid_o, int64_t *yes_o, int64_t *tout_o,
                      int64_t *uoff_o, int64_t *ulen_o)
{
    *type_id = -1;
    *ok_out = 0;
    *amt_o = *pid_o = *yes_o = *tout_o = 0;
    *uoff_o = 0;
    *ulen_o = -1;
    if (g_unit == 2 && hexlen % 2 != 0)
        return 0; /* odd hex: Python bytes.fromhex raises there */
    walk_t a;
    if (!walk(h, off, hexlen / g_unit, 2, &a))
        return 0;
    slice_t urlsl = l_nth(&a, 1, 0);
    slice_t body = l_nth(&a, 2, 0);
    *uoff_o = urlsl.off;
    *ulen_o = urlsl.len;
    int u = -1;
    if (urlsl.len >= 0) {
        for (int id = 0; id < T_COUNT; id++)
            if (url_is(h, urlsl, urls, uoff, id)) {
                u = id;
                break;
            }
    }
    *type_id = u;
    if (u == T_EXEC) {
        /* wasm execute: the canonical {"transfer":{"amount":"N"}}
         * payload decodes here; ANY other JSON shape goes to Python,
         * whose json.loads/int() semantics (whitespace, escapes,
         * duplicate keys, '+'/'_' int coercions) stay authoritative */
        walk_t b;
        if (!walk_or_ff(h, body, 8, &b))
            return 0;
        int s_ok = (body.len >= 0) && b.ok;
        slice_t j = l_nth(&b, 3, 0);
        int64_t amt = 0;
        int amt_set = 0;
        if (j.len >= 0) {
            static const char pre[] = "{\"transfer\":{\"amount\":\"";
            static const char post[] = "\"}}";
            int64_t plen = (int64_t)sizeof(pre) - 1;
            int64_t qlen = (int64_t)sizeof(post) - 1;
            int64_t dl = j.len - plen - qlen;
            if (dl < 1 || dl > 18)
                return 0; /* non-canonical: Python decides */
            for (int64_t i = 0; i < plen; i++)
                if (hb(h, j.off, i) != (int)(uint8_t)pre[i])
                    return 0;
            for (int64_t i = 0; i < qlen; i++)
                if (hb(h, j.off, plen + dl + i) != (int)(uint8_t)post[i])
                    return 0;
            int64_t v = 0;
            for (int64_t i = 0; i < dl; i++) {
                int c = hb(h, j.off, plen + i);
                if (c < '0' || c > '9')
                    return 0;
                v = v * 10 + (c - '0'); /* <= 18 digits: no overflow */
            }
            amt = v;
            amt_set = 1;
        }
        int shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3);
        *ok_out = (s_ok && shape_ok && amt_set) ? 1 : 0;
        *amt_o = amt_set ? amt : 0;
        return 1;
    }
    if (u < 0 || u >= T_BASIC_ALLOWANCE)
        return 1; /* unregistered (incl. the nested-only urls):
                     status stays "Unknown message type", zeros —
                     Python returns exactly this shape.  The URL
                     STRING itself is emitted Python-side. */

    walk_t b;
    if (!walk_or_ff(h, body, 8, &b))
        return 0;
    int s_ok = (body.len >= 0) && b.ok;

    int64_t amt = 0;
    int amt_set = 0; /* 0 = None */
    int64_t pid = 0;
    int pid_set = 0;
    int64_t yes = 0;
    int yes_set = 0;
    int64_t tout = 0;
    int tout_set = 0;
    int shape_ok = 0;
    int r;

#define COIN_SUM_INTO(wlk, fno)                                        \
    do {                                                               \
        r = coin_sum(h, (wlk), (fno), &amt);                           \
        if (r < 0)                                                     \
            return 0;                                                  \
        amt_set = (r == 1);                                            \
    } while (0)

    /* ---- amt ---- */
    if (u == T_SEND || u == T_DELEGATE || u == T_UNDELEGATE ||
        u == T_TRANSFER || u == T_DEPOSIT || u == T_VESTING ||
        u == T_PERM_LOCKED || u == T_GOV_V1_DEPOSIT) {
        COIN_SUM_INTO(&b, 3);
    } else if (u == T_REDELEGATE) {
        slice_t s = l_nth(&b, 4, 0);
        if (s.len >= 0) {
            r = coin_amt(h, s, &amt);
            if (r < 0)
                return 0;
            amt_set = (r == 1);
        }
    } else if (u == T_CREATE_VAL) {
        slice_t s = l_nth(&b, 7, 0);
        if (s.len >= 0) {
            r = coin_amt(h, s, &amt);
            if (r < 0)
                return 0;
            amt_set = (r == 1);
        }
    } else if (u == T_AUTHZ_EXEC) {
        walk_t a2;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &a2))
            return 0;
        if (a2.ok && url_is(h, l_nth(&a2, 1, 0), urls, uoff, T_SEND)) {
            walk_t in;
            if (!walk_or_ff(h, l_nth(&a2, 2, 0), 4, &in))
                return 0;
            /* python walks m_ld.get(2, [b""])[0]: absent -> b"" which
             * walks ok-empty; mirror: absent slice here means walk("")
             * -> ok with no fields -> sum None */
            if (l_nth(&a2, 2, 0).len < 0) {
                in.n = 0;
                in.ok = 1;
            }
            if (in.ok) {
                r = coin_sum(h, &in, 3, &amt);
                if (r < 0)
                    return 0;
                amt_set = (r == 1);
            }
        }
    } else if (u == T_GRANT_ALLOW) {
        walk_t a3;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &a3))
            return 0;
        if (a3.ok &&
            url_is(h, l_nth(&a3, 1, 0), urls, uoff, T_BASIC_ALLOWANCE)) {
            walk_t ab;
            if (!walk_or_ff(h, l_nth(&a3, 2, 0), 2, &ab))
                return 0;
            if (l_nth(&a3, 2, 0).len < 0) {
                ab.n = 0;
                ab.ok = 1;
            }
            if (ab.ok) {
                r = coin_sum(h, &ab, 1, &amt);
                if (r < 0)
                    return 0;
                amt_set = (r == 1);
            }
        }
    } else if (u == T_CANCEL_UNBOND || u == T_FUND_POOL) {
        slice_t s = l_nth(&b, u == T_FUND_POOL ? 1 : 3, 0);
        if (s.len >= 0) {
            r = coin_amt(h, s, &amt);
            if (r < 0)
                return 0;
            amt_set = (r == 1);
        }
    } else if (u == T_MULTISEND) {
        int nout = ld_count(&b, 2);
        if (nout > 0) {
            int64_t total = 0;
            int poison = 0;
            for (int k = 0; k < nout && !poison; k++) {
                walk_t o;
                if (!walk(h, l_nth(&b, 2, k).off, l_nth(&b, 2, k).len,
                          4, &o))
                    return 0;
                int64_t part = 0;
                int pset = 0;
                if (o.ok) {
                    r = coin_sum(h, &o, 2, &part);
                    if (r < 0)
                        return 0;
                    pset = (r == 1);
                }
                if (!pset)
                    poison = 1;
                else if (__builtin_add_overflow(total, part, &total))
                    return 0;
            }
            if (!poison) {
                amt = total;
                amt_set = 1;
            }
        }
    } else if (u == T_SUBMIT_PROPOSAL) {
        COIN_SUM_INTO(&b, 2);
    } else if (u == T_PERIODIC_VEST) {
        walk_t p;
        if (!walk_or_ff(h, l_nth(&b, 4, 0), 2, &p))
            return 0;
        if (p.ok) {
            r = coin_sum(h, &p, 2, &amt);
            if (r < 0)
                return 0;
            amt_set = (r == 1);
        }
    } else if (u == T_INSTANTIATE) {
        COIN_SUM_INTO(&b, 6);
    } else if (u == T_GOV_V1_SUBMIT) {
        int nmsg = ld_count(&b, 1);
        int64_t total = 0;
        int poison = (nmsg == 0);
        for (int k = 0; k < nmsg && !poison; k++) {
            walk_t m;
            if (!walk(h, l_nth(&b, 1, k).off, l_nth(&b, 1, k).len, 2,
                      &m))
                return 0;
            int64_t part = 0;
            int pset = 0;
            if (m.ok && url_is(h, l_nth(&m, 1, 0), urls, uoff, T_SEND)) {
                walk_t in;
                if (!walk_or_ff(h, l_nth(&m, 2, 0), 8, &in))
                    return 0;
                if (l_nth(&m, 2, 0).len < 0) {
                    in.n = 0;
                    in.ok = 1;
                }
                if (in.ok) {
                    r = coin_sum(h, &in, 3, &part);
                    if (r < 0)
                        return 0;
                    pset = (r == 1);
                }
            }
            if (!pset)
                poison = 1;
            else if (__builtin_add_overflow(total, part, &total))
                return 0;
        }
        if (!poison) {
            int64_t dep = 0;
            r = coin_sum(h, &b, 2, &dep);
            if (r < 0)
                return 0;
            if (r == 1) {
                if (__builtin_add_overflow(total, dep, &total))
                    return 0;
                amt = total;
                amt_set = 1;
            }
        }
    } else if (u == T_SUBMIT_EVIDENCE) {
        /* Equivocation.power varint inside the evidence Any */
        walk_t a2;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &a2))
            return 0;
        if (a2.ok &&
            url_is(h, l_nth(&a2, 1, 0), urls, uoff, T_EQUIVOCATION)) {
            walk_t ev;
            if (!walk_or_ff(h, l_nth(&a2, 2, 0), 4, &ev))
                return 0;
            if (l_nth(&a2, 2, 0).len < 0) {
                ev.n = 0;
                ev.ok = 1; /* python walks b"" -> ok-empty */
            }
            uint64_t pw;
            if (ev.ok && vi_get(&ev, 3, &pw)) {
                amt = (int64_t)pw;
                amt_set = 1;
            }
        }
    } else if (u == T_GROUP_SUBMIT) {
        /* repeated-Any messages (field 4): the gov v1 submit shape
         * without the initial-deposit coins */
        int nmsg = ld_count(&b, 4);
        int64_t total = 0;
        int poison = (nmsg == 0);
        for (int k = 0; k < nmsg && !poison; k++) {
            walk_t m;
            if (!walk(h, l_nth(&b, 4, k).off, l_nth(&b, 4, k).len, 2,
                      &m))
                return 0;
            int64_t part = 0;
            int pset = 0;
            if (m.ok && url_is(h, l_nth(&m, 1, 0), urls, uoff, T_SEND)) {
                walk_t in;
                if (!walk_or_ff(h, l_nth(&m, 2, 0), 8, &in))
                    return 0;
                if (l_nth(&m, 2, 0).len < 0) {
                    in.n = 0;
                    in.ok = 1;
                }
                if (in.ok) {
                    r = coin_sum(h, &in, 3, &part);
                    if (r < 0)
                        return 0;
                    pset = (r == 1);
                }
            }
            if (!pset)
                poison = 1;
            else if (__builtin_add_overflow(total, part, &total))
                return 0;
        }
        if (!poison) {
            amt = total;
            amt_set = 1;
        }
    }

    /* ---- pid / yes ---- */
    uint64_t uv;
    if (u == T_VOTE || u == T_DEPOSIT || u == T_VOTE_WEIGHTED ||
        u == T_GOV_V1_VOTE || u == T_GOV_V1_DEPOSIT ||
        u == T_GROUP_WITHDRAW || u == T_GROUP_VOTE ||
        u == T_GROUP_EXEC || u == T_GOV_V1_VOTE_WEIGHTED) {
        if (vi_get(&b, 1, &uv)) {
            pid = (int64_t)uv;
            pid_set = 1;
        }
    } else if (u == T_GROUP_UPD_MEMBERS || u == T_GROUP_UPD_ADMIN ||
               u == T_GROUP_UPD_METADATA || u == T_GROUP_CREATE_POLICY ||
               u == T_GROUP_LEAVE) {
        if (vi_get(&b, 2, &uv)) { /* group_id */
            pid = (int64_t)uv;
            pid_set = 1;
        }
    }
    if (u == T_VOTE || u == T_GOV_V1_VOTE || u == T_GROUP_VOTE) {
        if (vi_get(&b, 3, &uv)) {
            yes = (uv == 1) ? 1 : 0;
            yes_set = 1;
        }
    } else if (u == T_GROUP_CREATE_WITH_POLICY) {
        if (vi_get(&b, 5, &uv)) { /* group_policy_as_admin */
            yes = (uv == 1) ? 1 : 0;
            yes_set = 1;
        }
    } else if (u == T_VOTE_WEIGHTED || u == T_GOV_V1_VOTE_WEIGHTED) {
        walk_t wv;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &wv))
            return 0;
        if (wv.ok && vi_get(&wv, 1, &uv)) {
            yes = (uv == 1) ? 1 : 0;
            yes_set = 1;
        }
    } else if (u == T_CHAN_OPEN_INIT || u == T_CHAN_OPEN_TRY) {
        /* Channel.state enum at field 2 (init) / field 3 (try) */
        walk_t ch;
        if (!walk_or_ff(h, l_nth(&b, u == T_CHAN_OPEN_INIT ? 2 : 3, 0),
                        4, &ch))
            return 0;
        if (ch.ok && vi_get(&ch, 1, &uv)) {
            yes = (uv == 1) ? 1 : 0;
            yes_set = 1;
        }
    }

    /* ---- timeout (and the packet walk the IBC family shares) ---- */
    walk_t pkt;
    if (!walk_or_ff(h, l_nth(&b, 1, 0), 8, &pkt))
        return 0;
    int pkt_ok = pkt.ok;
    if (u == T_TRANSFER) {
        if (vi_get(&b, 7, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    } else if (u == T_VESTING || u == T_CANCEL_UNBOND) {
        if (vi_get(&b, 4, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    } else if (u == T_RECV_PACKET || u == T_ACK || u == T_TIMEOUT) {
        if (pkt_ok && vi_get(&pkt, 8, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    } else if (u == T_PERIODIC_VEST) {
        if (vi_get(&b, 3, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    } else if (u == T_SUBMIT_EVIDENCE) {
        /* Equivocation.height varint */
        walk_t a2;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &a2))
            return 0;
        if (a2.ok &&
            url_is(h, l_nth(&a2, 1, 0), urls, uoff, T_EQUIVOCATION)) {
            walk_t ev;
            if (!walk_or_ff(h, l_nth(&a2, 2, 0), 4, &ev))
                return 0;
            if (l_nth(&a2, 2, 0).len < 0) {
                ev.n = 0;
                ev.ok = 1;
            }
            if (ev.ok && vi_get(&ev, 1, &uv)) {
                tout = (int64_t)uv;
                tout_set = 1;
            }
        }
    } else if (u == T_CONN_OPEN_INIT) {
        if (vi_get(&b, 4, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    } else if (u == T_CONN_OPEN_TRY) {
        if (vi_get(&b, 5, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    } else if (u == T_CONN_OPEN_CONFIRM) {
        walk_t hh;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &hh))
            return 0;
        if (hh.ok && vi_get(&hh, 2, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    } else if (u == T_CHAN_OPEN_TRY || u == T_CHAN_OPEN_ACK) {
        walk_t hh;
        if (!walk_or_ff(h, l_nth(&b, 6, 0), 2, &hh))
            return 0;
        if (hh.ok && vi_get(&hh, 2, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    } else if (u == T_CHAN_OPEN_CONFIRM || u == T_CHAN_CLOSE_CONFIRM) {
        walk_t hh;
        if (!walk_or_ff(h, l_nth(&b, 4, 0), 2, &hh))
            return 0;
        if (hh.ok && vi_get(&hh, 2, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    } else if (u == T_TIMEOUT_ON_CLOSE) {
        if (pkt_ok && vi_get(&pkt, 8, &uv)) {
            tout = (int64_t)uv;
            tout_set = 1;
        }
    }

    /* ---- shape checks (one arm per type, mirroring the dispatch) -- */
    if (u == T_SEND || u == T_DELEGATE || u == T_UNDELEGATE ||
        u == T_CHAN_CLOSE_INIT) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3);
    } else if (u == T_VOTE) {
        uint64_t d;
        shape_ok = vi_get(&b, 1, &d) && vi_get(&b, 3, &d) &&
                   has_ld(&b, 2);
    } else if (u == T_TRANSFER) {
        uint64_t d;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && has_ld(&b, 5) && vi_get(&b, 7, &d);
    } else if (u == T_WITHDRAW || u == T_SET_WITHDRAW ||
               u == T_REVOKE_ALLOW) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2);
    } else if (u == T_REDELEGATE) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4);
    } else if (u == T_DEPOSIT) {
        uint64_t d;
        shape_ok = vi_get(&b, 1, &d) && has_ld(&b, 2) && has_ld(&b, 3);
    } else if (u == T_GRANT) {
        walk_t g, ga;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &g))
            return 0;
        slice_t gal = g.ok ? l_nth(&g, 1, 0) : (slice_t){ 0, -1 };
        /* python: walk(g_ld.get(1, [b"\xff"])[0], 2) */
        if (g.ok && gal.len < 0) {
            ga.n = 0;
            ga.ok = 0;
        } else if (!walk_or_ff(h, gal, 2, &ga)) {
            return 0;
        }
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   g.ok && ga.ok &&
                   url_is(h, l_nth(&ga, 1, 0), urls, uoff, T_STAKE_AUTH);
    } else if (u == T_AUTHZ_EXEC || u == T_GRANT_ALLOW) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2);
    } else if (u == T_REVOKE) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3);
    } else if (u == T_UNJAIL) {
        shape_ok = has_ld(&b, 1);
    } else if (u == T_CREATE_VAL) {
        walk_t d;
        if (!walk_or_ff(h, l_nth(&b, 1, 0), 2, &d))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 3) && has_ld(&b, 4) &&
                   has_ld(&b, 5) && has_ld(&b, 7) && d.ok &&
                   has_ld(&d, 1);
    } else if (u == T_EDIT_VAL) {
        walk_t d;
        if (!walk_or_ff(h, l_nth(&b, 1, 0), 2, &d))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && d.ok && has_ld(&d, 1);
    } else if (u == T_VESTING) {
        uint64_t d;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   vi_get(&b, 4, &d);
    } else if (u == T_MULTISEND) {
        walk_t o;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &o))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && o.ok &&
                   has_ld(&o, 1);
    } else if (u == T_CANCEL_UNBOND) {
        uint64_t d;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   vi_get(&b, 4, &d);
    } else if (u == T_FUND_POOL) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2);
    } else if (u == T_WITHDRAW_COMM) {
        shape_ok = has_ld(&b, 1);
    } else if (u == T_VOTE_WEIGHTED) {
        walk_t wv;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &wv))
            return 0;
        shape_ok = vi_get(&b, 1, &d) && has_ld(&b, 2) &&
                   has_ld(&b, 3) && wv.ok && has_ld(&wv, 2);
    } else if (u == T_SUBMIT_PROPOSAL) {
        walk_t p;
        if (!walk_or_ff(h, l_nth(&b, 1, 0), 2, &p))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   p.ok &&
                   url_is(h, l_nth(&p, 1, 0), urls, uoff,
                          T_TEXT_PROPOSAL);
    } else if (u == T_UPDATE_CLIENT) {
        walk_t a2;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &a2))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && a2.ok &&
                   url_is(h, l_nth(&a2, 1, 0), urls, uoff, T_TM_HEADER);
    } else if (u == T_RECV_PACKET) {
        walk_t g;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &g))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && pkt_ok && g.ok &&
                   vi_get(&pkt, 8, &d);
    } else if (u == T_PERM_LOCKED) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3);
    } else if (u == T_PERIODIC_VEST) {
        walk_t p;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 4, 0), 2, &p))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 4) &&
                   vi_get(&b, 3, &d) && p.ok;
    } else if (u == T_INSTANTIATE) {
        uint64_t d;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 4) &&
                   has_ld(&b, 5) && has_ld(&b, 6) && vi_get(&b, 3, &d);
    } else if (u == T_VERIFY_INVARIANT) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3);
    } else if (u == T_GOV_V1_VOTE) {
        uint64_t d;
        shape_ok = vi_get(&b, 1, &d) && vi_get(&b, 3, &d) &&
                   has_ld(&b, 2) && has_ld(&b, 4);
    } else if (u == T_GOV_V1_DEPOSIT) {
        uint64_t d;
        shape_ok = vi_get(&b, 1, &d) && has_ld(&b, 2) && has_ld(&b, 3);
    } else if (u == T_GOV_V1_SUBMIT) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3);
    } else if (u == T_ACK) {
        walk_t hh;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 4, 0), 2, &hh))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && has_ld(&b, 5) && pkt_ok && hh.ok &&
                   vi_get(&pkt, 8, &d);
    } else if (u == T_TIMEOUT) {
        walk_t g;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &g))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 5) && vi_get(&b, 4, &d) && pkt_ok &&
                   g.ok && vi_get(&pkt, 8, &d);
    } else if (u == T_SUBMIT_EVIDENCE) {
        walk_t a2, ev;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &a2))
            return 0;
        slice_t evs = a2.ok ? l_nth(&a2, 2, 0) : (slice_t){ 0, -1 };
        if (a2.ok && evs.len < 0) {
            ev.n = 0;
            ev.ok = 1; /* python walks b"" -> ok-empty */
        } else if (!walk_or_ff(h, evs, 4, &ev)) {
            return 0;
        }
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && a2.ok &&
                   url_is(h, l_nth(&a2, 1, 0), urls, uoff,
                          T_EQUIVOCATION) &&
                   ev.ok && vi_get(&ev, 1, &d) && vi_get(&ev, 3, &d);
    } else if (u == T_EXEC_LEGACY) {
        walk_t p;
        if (!walk_or_ff(h, l_nth(&b, 1, 0), 2, &p))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && p.ok &&
                   url_is(h, l_nth(&p, 1, 0), urls, uoff,
                          T_TEXT_PROPOSAL);
    } else if (u == T_GROUP_CREATE) {
        walk_t m;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 4, &m))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   m.ok && has_ld(&m, 1) && has_ld(&m, 2);
    } else if (u == T_GROUP_UPD_MEMBERS) {
        walk_t m;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 4, &m))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 3) && vi_get(&b, 2, &d) &&
                   m.ok && has_ld(&m, 1);
    } else if (u == T_GROUP_UPD_ADMIN || u == T_GROUP_UPD_METADATA) {
        uint64_t d;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 3) && vi_get(&b, 2, &d);
    } else if (u == T_GROUP_CREATE_POLICY) {
        walk_t a4;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 4, 0), 2, &a4))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 3) && has_ld(&b, 4) &&
                   vi_get(&b, 2, &d) && a4.ok &&
                   url_is(h, l_nth(&a4, 1, 0), urls, uoff,
                          T_THRESHOLD_POLICY);
    } else if (u == T_GROUP_CREATE_WITH_POLICY) {
        walk_t m, a6;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 4, &m))
            return 0;
        if (!walk_or_ff(h, l_nth(&b, 6, 0), 2, &a6))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && has_ld(&b, 6) && vi_get(&b, 5, &d) &&
                   m.ok && has_ld(&m, 1) && a6.ok &&
                   url_is(h, l_nth(&a6, 1, 0), urls, uoff,
                          T_THRESHOLD_POLICY);
    } else if (u == T_GROUP_POLICY_ADMIN || u == T_GROUP_POLICY_METADATA) {
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3);
    } else if (u == T_GROUP_POLICY_DECISION) {
        walk_t a3;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &a3))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   a3.ok &&
                   url_is(h, l_nth(&a3, 1, 0), urls, uoff,
                          T_THRESHOLD_POLICY);
    } else if (u == T_GROUP_SUBMIT) {
        uint64_t d;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && vi_get(&b, 5, &d);
    } else if (u == T_GROUP_WITHDRAW || u == T_GROUP_EXEC) {
        uint64_t d;
        shape_ok = vi_get(&b, 1, &d) && has_ld(&b, 2);
    } else if (u == T_GROUP_VOTE) {
        uint64_t d;
        shape_ok = vi_get(&b, 1, &d) && vi_get(&b, 3, &d) &&
                   vi_get(&b, 5, &d) && has_ld(&b, 2) && has_ld(&b, 4);
    } else if (u == T_GROUP_LEAVE) {
        uint64_t d;
        shape_ok = has_ld(&b, 1) && vi_get(&b, 2, &d);
    } else if (u == T_GOV_V1_VOTE_WEIGHTED) {
        walk_t wv;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &wv))
            return 0;
        shape_ok = vi_get(&b, 1, &d) && has_ld(&b, 2) &&
                   has_ld(&b, 3) && has_ld(&b, 4) && wv.ok &&
                   has_ld(&wv, 2);
    } else if (u == T_CREATE_CLIENT) {
        walk_t a1, a2;
        if (!walk_or_ff(h, l_nth(&b, 1, 0), 2, &a1))
            return 0;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &a2))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   a1.ok && a2.ok &&
                   url_is(h, l_nth(&a1, 1, 0), urls, uoff,
                          T_CLIENT_STATE) &&
                   url_is(h, l_nth(&a2, 1, 0), urls, uoff,
                          T_CONSENSUS_STATE);
    } else if (u == T_UPGRADE_CLIENT) {
        walk_t a2, a3;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &a2))
            return 0;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &a3))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && has_ld(&b, 5) && has_ld(&b, 6) &&
                   a2.ok && a3.ok &&
                   url_is(h, l_nth(&a2, 1, 0), urls, uoff,
                          T_CLIENT_STATE) &&
                   url_is(h, l_nth(&a3, 1, 0), urls, uoff,
                          T_CONSENSUS_STATE);
    } else if (u == T_SUBMIT_MISBEHAVIOUR) {
        walk_t a2;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &a2))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   a2.ok &&
                   url_is(h, l_nth(&a2, 1, 0), urls, uoff,
                          T_MISBEHAVIOUR);
    } else if (u == T_CONN_OPEN_INIT) {
        walk_t cp;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 2, &cp))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 5) && vi_get(&b, 4, &d) && cp.ok &&
                   has_ld(&cp, 1);
    } else if (u == T_CONN_OPEN_TRY) {
        walk_t a3, cp;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &a3))
            return 0;
        if (!walk_or_ff(h, l_nth(&b, 4, 0), 2, &cp))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 3) && has_ld(&b, 4) &&
                   has_ld(&b, 7) && has_ld(&b, 8) && has_ld(&b, 12) &&
                   vi_get(&b, 5, &d) && a3.ok && cp.ok &&
                   url_is(h, l_nth(&a3, 1, 0), urls, uoff,
                          T_CLIENT_STATE);
    } else if (u == T_CONN_OPEN_ACK) {
        walk_t a4;
        if (!walk_or_ff(h, l_nth(&b, 4, 0), 2, &a4))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && has_ld(&b, 5) && has_ld(&b, 6) &&
                   has_ld(&b, 10) && a4.ok &&
                   url_is(h, l_nth(&a4, 1, 0), urls, uoff,
                          T_CLIENT_STATE);
    } else if (u == T_CONN_OPEN_CONFIRM) {
        walk_t hh;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 2, &hh))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && hh.ok && vi_get(&hh, 2, &d);
    } else if (u == T_CHAN_OPEN_INIT) {
        walk_t ch;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 2, 0), 4, &ch))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   ch.ok && vi_get(&ch, 1, &d);
    } else if (u == T_CHAN_OPEN_TRY) {
        walk_t ch, hh;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 3, 0), 4, &ch))
            return 0;
        if (!walk_or_ff(h, l_nth(&b, 6, 0), 2, &hh))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 3) && has_ld(&b, 4) &&
                   has_ld(&b, 5) && has_ld(&b, 6) && has_ld(&b, 7) &&
                   ch.ok && vi_get(&ch, 1, &d) && hh.ok &&
                   vi_get(&hh, 2, &d);
    } else if (u == T_CHAN_OPEN_ACK) {
        walk_t hh;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 6, 0), 2, &hh))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && has_ld(&b, 5) && has_ld(&b, 6) &&
                   has_ld(&b, 7) && hh.ok && vi_get(&hh, 2, &d);
    } else if (u == T_CHAN_OPEN_CONFIRM || u == T_CHAN_CLOSE_CONFIRM) {
        walk_t hh;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 4, 0), 2, &hh))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && has_ld(&b, 5) && hh.ok &&
                   vi_get(&hh, 2, &d);
    } else if (u == T_TIMEOUT_ON_CLOSE) {
        walk_t hh;
        uint64_t d;
        if (!walk_or_ff(h, l_nth(&b, 4, 0), 2, &hh))
            return 0;
        shape_ok = has_ld(&b, 1) && has_ld(&b, 2) && has_ld(&b, 3) &&
                   has_ld(&b, 4) && has_ld(&b, 6) && vi_get(&b, 5, &d) &&
                   pkt_ok && hh.ok && vi_get(&pkt, 8, &d);
    }

    int needs_amt =
        (u == T_SEND || u == T_DELEGATE || u == T_TRANSFER ||
         u == T_UNDELEGATE || u == T_REDELEGATE || u == T_DEPOSIT ||
         u == T_AUTHZ_EXEC || u == T_GRANT_ALLOW || u == T_CREATE_VAL ||
         u == T_VESTING || u == T_MULTISEND || u == T_CANCEL_UNBOND ||
         u == T_FUND_POOL || u == T_SUBMIT_PROPOSAL ||
         u == T_PERM_LOCKED || u == T_PERIODIC_VEST ||
         u == T_INSTANTIATE || u == T_GOV_V1_DEPOSIT ||
         u == T_GOV_V1_SUBMIT || u == T_SUBMIT_EVIDENCE ||
         u == T_GROUP_SUBMIT);
    *ok_out = (s_ok && shape_ok && (!needs_amt || amt_set)) ? 1 : 0;
    *amt_o = amt_set ? amt : 0;
    *pid_o = pid_set ? pid : 0;
    *yes_o = yes_set ? yes : 0;
    *tout_o = tout_set ? tout : 0;
    return 1;
}

/* ---- the batch entry point (pyarrow string-array layout) ----------- */
void registry_decode_batch(const uint8_t *data, const int64_t *offsets,
                           int64_t nrows, const uint8_t *urls,
                           const int32_t *uoff, int32_t *type_id,
                           uint8_t *status_ok, int64_t *amt,
                           int64_t *pid, int64_t *yes, int64_t *tout,
                           uint8_t *needs_py, int64_t *url_off,
                           int64_t *url_len, int32_t is_hex)
{
    g_unit = is_hex ? 2 : 1;
    for (int64_t r = 0; r < nrows; r++) {
        int64_t off = offsets[r];
        int64_t len = offsets[r + 1] - off;
        int done = decode_one(data, off, len, urls, uoff, &type_id[r],
                              &status_ok[r], &amt[r], &pid[r], &yes[r],
                              &tout[r], &url_off[r], &url_len[r]);
        needs_py[r] = done ? 0 : 1;
    }
}
