"""Merge sf1.0 sweep logs into SF1_GATE.json (VERDICT r10 item 4).

The r11 sweep ran in two phases: the full battery against the first
10x replica (whose small copy strides collided with operator-planted
ids — documents-family results there are invalid), then the remaining
+ flagged operators against the stride-fixed replica. Later logs win
per query, so every documents-family row comes from the fixed data.

Usage: python tools/summarize_sf1.py LOG [LOG...] > SF1_GATE.json
"""

from __future__ import annotations

import json
import re
import sys

ROW = re.compile(
    r"^(OK|FAIL|NEAR|rows)\s+([a-z0-9_]+): (.*)$", re.M)
TIME = re.compile(r"\((\d+(?:\.\d+)?)s\)")


def parse(path: str) -> dict[str, dict]:
    text = open(path, "rb").read().decode("utf-8", "replace")
    text = text.replace("\r", "\n")
    out: dict[str, dict] = {}
    for m in ROW.finditer(text):
        tag, name, rest = m.groups()
        t = TIME.search(rest)
        out[name] = {
            "status": {"OK": "exact", "rows": "rows-only",
                       "FAIL": "fail", "NEAR": "near"}[tag],
            "detail": rest.strip(),
            "seconds": float(t.group(1)) if t else None,
        }
    return out


def main(paths: list[str]) -> None:
    merged: dict[str, dict] = {}
    for p in paths:
        merged.update(parse(p))   # later logs win
    n_exact = sum(1 for v in merged.values()
                  if v["status"] in ("exact", "rows-only"))
    failing = sorted(n for n, v in merged.items()
                     if v["status"] in ("fail", "near"))
    json.dump(
        {"sf": 1.0, "total": len(merged), "clean": n_exact,
         "failing": failing, "queries": merged},
        sys.stdout, indent=1, sort_keys=True)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main(sys.argv[1:])
