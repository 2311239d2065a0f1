"""Full-gate partition-layout drift probe (SURVEY.md §5).

Runs the ENTIRE oracle gate under a deliberately awkward layout —
5 cores, 7 shuffle partitions — so float summation order differs from
both the tuned session and the driver harness. Any query whose result
depends on accidental summation-order agreement (the q2/q15/q11 bug
class, fixed in round 2 with per-row integer quantization) fails here
before it can fail in a future round's gate.

Usage: python tools/drift_probe.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

import zigchain_indexer_clickhouse_spark.session as sess  # noqa: E402


def _awkward_session(name: str = "drift-probe", master: str = "local[5]"):
    return (
        SparkSession.builder.master("local[5]")
        .appName("drift-probe")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    # patch the session factory BEFORE the gate imports it
    sess.get_spark = _awkward_session
    import tools.check_correctness as cc

    cc.get_spark = _awkward_session
    sys.argv = ["drift_probe", *(sys.argv[1:] or ["/root/testdata/sf0.01"])]
    cc.main()


if __name__ == "__main__":
    main()
