"""Oracle-text snapshot — the re-verification hygiene gate.

Round 7 shipped a widened `msg_registry_decode` oracle with an engine
that still computed the old semantics; the driver's 50-query sample
happened not to draw it, so a green CORRECTNESS file masked a broken
tree for a whole round. This tool closes that hole: the committed
snapshot (`tools/oracle_snapshot.json`) records a sha256 of every
registered oracle's text, and `tests/test_registry_hygiene.py` fails
the suite whenever a live oracle differs from the snapshot. The ONLY
way to refresh the snapshot is `--update`, which first re-runs the
local correctness gate on exactly the changed/added operators — so an
oracle-semantics change cannot reach a commit without a same-session
green gate line for that operator.

The snapshot is also the single home of RE-VERIFICATION POLICY
(VERDICT r8 item 8 — this superseded the registry's hardcoded
`_REVERIFY_R04/_R06` frozensets): each entry records
``reverify_after`` — the highest driver round whose CORRECTNESS rows
describe the OLD semantics. A driver row only counts as verification
for ordering purposes when its round is greater, so a query whose
oracle just changed drops back into the never-verified-first tier
until the driver re-draws it, even though ``--update`` already
re-gated it locally.

Usage:
    python tools/oracle_snapshot.py                # report drift
    python tools/oracle_snapshot.py --update [sf_dir]   # gate + rewrite
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "oracle_snapshot.json")


def current_hashes() -> dict[str, str]:
    from zigchain_indexer_clickhouse_spark.plans import registry

    oracles = registry.oracles()
    out = {}
    for name in sorted(registry.queries()):
        text = oracles.get(name)
        out[name] = (
            hashlib.sha256(text.encode()).hexdigest()[:16]
            if text is not None
            else "rows-only"
        )
    return out


def load_snapshot() -> dict[str, dict]:
    """Snapshot entries: {name: {"hash": str, "reverify_after": int}}.
    Legacy flat-string entries (pre-r9) migrate in memory with
    reverify_after 0."""
    if not os.path.exists(SNAPSHOT):
        return {}
    with open(SNAPSHOT) as f:
        raw = json.load(f)
    return {
        n: (v if isinstance(v, dict) else {"hash": v, "reverify_after": 0})
        for n, v in raw.items()
    }


def drift(cur: dict[str, str], snap: dict[str, dict]) -> list[str]:
    """Names whose oracle text changed or that are new since snapshot."""
    return [n for n, h in cur.items()
            if snap.get(n, {}).get("hash") != h]


def max_artifact_round() -> int:
    """Highest round number among the repo's CORRECTNESS_r*.json —
    rows at or below it predate any oracle change made this session."""
    import glob
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [int(m.group(1))
              for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
              if (m := re.search(r"r(\d+)", os.path.basename(f)))]
    return max(rounds, default=0)


def main() -> int:
    update = "--update" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--update"]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    cur = current_hashes()
    snap = load_snapshot()
    changed = drift(cur, snap)
    removed = sorted(set(snap) - set(cur))

    if not changed and not removed:
        print(f"snapshot current: {len(cur)} oracles, no drift")
        return 0
    print(f"drifted/new: {changed}")
    if removed:
        print(f"removed: {removed}")
    if not update:
        print("run with --update to re-gate the changed operators and "
              "refresh the snapshot")
        return 1

    # Gate first: the changed operators must pass the local oracle
    # check before the snapshot will record their new text.
    gate_names = [n for n in changed if cur[n] != "rows-only"]
    if gate_names:
        cmd = [sys.executable, "tools/check_correctness.py", sf_dir,
               *gate_names]
        print("gating:", " ".join(cmd))
        proc = subprocess.run(cmd, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        if proc.returncode != 0:
            print("GATE FAILED — snapshot NOT updated")
            return proc.returncode
    # Changed names get reverify_after = the current max artifact
    # round: every existing driver row predates the new semantics, so
    # only a LATER round's green row re-verifies them for ordering.
    cutoff = max_artifact_round()
    out = {
        n: {
            "hash": h,
            "reverify_after": (cutoff if n in changed
                               else snap[n]["reverify_after"]),
        }
        for n, h in cur.items()
    }
    with open(SNAPSHOT, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"snapshot updated: {len(out)} oracles "
          f"({len(changed)} re-gated green, reverify_after={cutoff})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
