"""Capture .explain("formatted") for headline queries into
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r13).

Usage: python tools/capture_plans.py <suffix> [name ...]
  suffix: 'before' or 'after' (file name suffix)
  names:  query names; defaults to the bench HEADLINE set.

Writes plans/r12/<query>_<suffix>.txt and prints a one-line plan-shape
summary (exchange count, join strategies, python eval nodes) per query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigchain_indexer_clickhouse_spark.plans import registry
from zigchain_indexer_clickhouse_spark.session import get_spark


def summarize(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "SMJ": len(re.findall(r"SortMergeJoin", plan)),
        "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
        "SHJ": len(re.findall(r"ShuffledHashJoin", plan)),
        "BNLJ": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "Py": len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", plan)),
        "Sort": len(re.findall(r"\n[^\n]*\bSort\b", plan)),
        "Scan": len(re.findall(r"Scan parquet", plan)),
    }
    return " ".join(f"{k}={v}" for k, v in counts.items())


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    qs = registry.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {exc}")
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {summarize(plan)}")
    spark.stop()


if __name__ == "__main__":
    main()
