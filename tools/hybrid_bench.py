"""Head-to-head: registry decode volume paths at the 30× tier
(VERDICT r9 item #1 done-criterion: hybrid ≥5× the Python path on the
full-range scan).

Builds a 30×-sf0.1-sized blob dataset (3M messages, the same 40-kind
synthesis the registry operators decode), persists it as parquet, then
times each path as a long-lived session would pay it per fresh scan:

* python — parquet scan → Arrow-batched walker UDF → 37-group agg.
* hybrid — parquet scan → claim-gated positional projections
  (materialized under wholeStage=false, per the production runner) →
  claimed ∪ Python tail → agg; the per-run persist is dropped after
  each run so every run pays the full scan+decode, while Janino's
  class cache (keyed by generated source) stays warm after run 0 —
  exactly the amortization profile of a real deployment.
* native — the C kernel behind the same mapInPandas shape (the r10
  default volume path).
* walker — the interpreted expression fold, on a 100k subsample
  (projected to the full size; ~1.4 ms/row makes the full run
  pointless).

Writes HYBRID_BENCH.json and prints per-run wall times.

Usage: python tools/hybrid_bench.py [rows] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "HYBRID_BENCH.json"
DATA = f"/tmp/hybrid_bench_blobs_{ROWS}"


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        # the three decode paths together generate a lot of compiled
        # code (positional projections + UDF plans + the interpreted
        # fold); the JVM default 240 MB code cache fills and DISABLES
        # the JIT, poisoning every timing after it
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from zigchain_indexer_clickhouse_spark.functions.registry_positional \
        import add_positional_decode
    from zigchain_indexer_clickhouse_spark.operators.dedup import \
        _STAGE_CACHE
    from zigchain_indexer_clickhouse_spark.sources import tx_decode as txd

    if not os.path.isfile(os.path.join(DATA, "_SUCCESS")):
        base = spark.range(ROWS).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 9999).alias("user_id"),
            ((F.col("id") % 100000) / 7.0).alias("value"),
        )
        base.select(txd._registry_blob_hex().alias("blob_hex")) \
            .write.mode("overwrite").parquet(DATA)
    src = spark.read.parquet(DATA)
    n = src.count()
    urls = dict(txd._REGISTRY_URL_KEYS)

    def agg(decoded):
        return (decoded.groupBy("type_url", "status")
                .agg(F.count("*").alias("n"),
                     F.sum("amt").alias("amt"),
                     F.sum("pid").alias("pid"),
                     F.sum("yes").alias("yes"),
                     F.sum(F.pmod(F.col("timeout"),
                                  F.lit(txd._TOUT_PRIME))).alias("tout")))

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    results: dict = {"rows": n, "loadavg": list(os.getloadavg())}

    # the shared cost both paths pay before any decode: the pruned
    # parquet scan itself — the denominator floor for end-to-end
    # ratios at small tiers
    floor = []
    for _ in range(3):
        t0 = time.perf_counter()
        src.groupBy().agg(F.sum(F.length("blob_hex"))).collect()
        floor.append(round(time.perf_counter() - t0, 2))
    results["scan_floor_sec"] = floor

    # ---- python path -----------------------------------------------------
    py_times, py_ref = [], None
    for run in range(3):
        t0 = time.perf_counter()
        d = txd.registry_decoded_struct_py(F.col("blob_hex"))
        py_ref = canon(agg(src.select(d.alias("d")).select("d.*")))
        py_times.append(round(time.perf_counter() - t0, 2))
        print(f"# python run {run}: {py_times[-1]}s", file=sys.stderr,
              flush=True)
    results["python_sec"] = py_times

    # ---- hybrid path (production runner shape, fresh persist per run) ----
    hy_times = []
    for run in range(3):
        # drop the memoized stage so each run pays scan + decode
        for k in list(_STAGE_CACHE):
            if k[2] == "hybench":
                _STAGE_CACHE.pop(k).unpersist()
        t0 = time.perf_counter()
        decoded = txd.registry_decoded_df_hybrid(
            spark, DATA, "hybench", lambda: src)
        got = canon(agg(decoded))
        hy_times.append(round(time.perf_counter() - t0, 2))
        print(f"# hybrid run {run}: {hy_times[-1]}s", file=sys.stderr,
              flush=True)
        assert got == py_ref, "hybrid != python aggregate"
    results["hybrid_sec"] = hy_times

    # ---- native path (the r10 default volume shape) -----------------------
    from zigchain_indexer_clickhouse_spark.functions.native_registry \
        import native_available
    if native_available():
        na_times = []
        for run in range(3):
            t0 = time.perf_counter()
            got = canon(agg(txd.registry_decoded_df_native(src)))
            na_times.append(round(time.perf_counter() - t0, 2))
            print(f"# native run {run}: {na_times[-1]}s", file=sys.stderr,
                  flush=True)
            assert got == py_ref, "native != python aggregate"
        results["native_sec"] = na_times
        na_ss = min(na_times)
        results["native_speedup_vs_python"] = round(min(py_times) / na_ss, 2)
        results["native_us_per_row"] = round(na_ss / n * 1e6 * 32, 2)

    # ---- interpreted walker reference (subsample, projected) -------------
    if os.environ.get("HYBRID_BENCH_WALKER", "1") == "1":
        sub = src.limit(100_000)
        sub.count()
        t0 = time.perf_counter()
        dw = txd.registry_decoded_struct(F.col("blob_hex"))
        agg(sub.select(dw.alias("d")).select("d.*")).collect()
        walker_sub = time.perf_counter() - t0
        results["walker_100k_sec"] = round(walker_sub, 2)
        results["walker_projected_sec"] = round(walker_sub * n / 100_000, 1)

    py_ss = min(py_times)
    hy_ss = min(hy_times[1:]) if len(hy_times) > 1 else hy_times[0]
    results["steady_speedup_vs_python"] = round(py_ss / hy_ss, 2)
    results["cold_speedup_vs_python"] = round(py_times[0] / hy_times[0], 2)
    results["python_us_per_row"] = round(py_ss / n * 1e6 * 32, 2)
    results["hybrid_us_per_row"] = round(hy_ss / n * 1e6 * 32, 2)
    print(json.dumps(results, indent=1))
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
