"""Plan auditor: dumps a one-line physical summary per registered batch
query (exchanges, join strategies, pushed filters, codegen spans) as a
markdown table — the data behind PLANS.md.

Usage: python tools/audit_plans.py [sf_dir] > plans_audit.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from zigchain_indexer_clickhouse_spark.plans import registry  # noqa: E402
from zigchain_indexer_clickhouse_spark.session import get_spark  # noqa: E402


def summarize(plan: str) -> dict[str, object]:
    return {
        "exchanges": len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
        "bhj": plan.count(") BroadcastHashJoin"),
        "smj": plan.count(") SortMergeJoin"),
        "shj": plan.count(") ShuffledHashJoin"),
        "bnlj": plan.count(") BroadcastNestedLoopJoin"),
        "cartesian": plan.count(") CartesianProduct"),
        "take_ordered": ") TakeOrderedAndProject" in plan,
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "codegen": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "py_arrow": plan.count("MapInPandas") + plan.count("ArrowEvalPython"),
        "py_row": plan.count("BatchEvalPython"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("audit")
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    print("| query | exch | BHJ | SMJ | SHJ | BNLJ | topN | pushdown | "
          "codegen spans | arrow |")
    print("| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |")
    for name, fn in sorted(registry.queries().items()):
        if name.startswith("stream_"):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(fmt)
        except Exception as ex:  # pragma: no cover
            print(f"| {name} | ERROR: {str(ex)[:60]} |")
            continue
        s = summarize(plan)
        assert not s["cartesian"] and not s["py_row"], name
        print(
            f"| {name} | {s['exchanges']} | {s['bhj']} | {s['smj']} | "
            f"{s['shj']} | {s['bnlj']} | {'y' if s['take_ordered'] else ''} | "
            f"{'y' if s['pushed'] else ''} | {s['codegen']} | "
            f"{s['py_arrow'] or ''} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
