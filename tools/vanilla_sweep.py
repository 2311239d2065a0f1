"""Vanilla-session sweep (SURVEY.md §5): run every registered query
under an UNTUNED SparkSession — the driver-harness seam. Catches
operators that silently depend on tuned session conf (AQE flags,
timezone, nanosAsLong, Arrow settings).

Usage: python tools/vanilla_sweep.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("vanilla-sweep")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as m

    bad = []
    qs = m.queries()
    for name, fn in qs.items():
        try:
            n = fn(spark, sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — report, don't abort
            bad.append((name, str(ex)[:200]))
            continue
        if n == 0 and not name.startswith("stream_"):
            print(f"WARN  {name}: 0 rows")
    print(f"{len(qs)} queries swept under vanilla session")
    print("FAILURES:", bad if bad else "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
