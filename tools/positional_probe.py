"""Probe 9: positional dispatch vs Python walker — equivalence on the
synthesis grid + byte soup, claim coverage, then throughput at 30×."""
import os
import random
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import SparkSession, functions as F  # noqa: E402

from zigchain_indexer_clickhouse_spark.functions.registry_positional import (  # noqa: E402
    add_positional_decode,
)
from zigchain_indexer_clickhouse_spark.functions.protobuf_py import (  # noqa: E402
    registry_decode_py,
)

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from zigchain_indexer_clickhouse_spark.sources.tx_decode import (  # noqa: E402
    _REGISTRY_URL_KEYS, _registry_blob_hex, registry_decoded_struct_py,
)

URLS = dict(_REGISTRY_URL_KEYS)

# ---- 1. synthesis grid -----------------------------------------------------
gen = spark.createDataFrame(
    [(e, u, v / 7.0) for e in range(80)
     for u, v in [(e * 13 % 9999, e * 31 % 997), (3, 0.0), (9998, 12345.0)]],
    "event_id long, user_id long, value double",
).select(_registry_blob_hex().alias("blob_hex"))
t0 = time.time()
rows = gen.collect()
print(f"synthesis collect: {time.time()-t0:.1f}s ({len(rows)} rows)",
      flush=True)

grid = spark.createDataFrame([(r["blob_hex"],) for r in rows],
                             "blob_hex string")
t0 = time.time()
d1 = add_positional_decode(grid, "blob_hex", URLS,
                           carry=["blob_hex"])
print(f"decode build: {time.time()-t0:.1f}s", flush=True)
got = d1.select("blob_hex", "__rp_d").collect()
claimed = sum(1 for r in got if r["__rp_d"] is not None)
print(f"grid: {len(got)} rows, claimed {claimed} "
      f"({100.0*claimed/len(got):.1f}%)")
bad = 0
for r in got:
    exp = registry_decode_py(bytes.fromhex(r["blob_hex"]), URLS)
    d = r["__rp_d"]
    if d is None:
        bad += 1
        print("UNCLAIMED grid row; python:", exp,
              "blob:", r["blob_hex"][:80])
        if bad > 5:
            break
        continue
    gotr = (d["type_url"], d["status"], d["amt"], d["pid"], d["yes"],
            d["timeout"])
    if gotr != exp:
        bad += 1
        print("MISMATCH", gotr, "!=", exp, "blob:", r["blob_hex"][:120])
        if bad > 8:
            break
print(f"grid equivalence: {bad} problems")

# ---- 2. byte soup: claimed rows must equal python --------------------------
rng = random.Random(7)
cases = []
for r in rows[:50]:
    b = bytes.fromhex(r["blob_hex"])
    cases.append(b)
    # mutations: truncate, flip a byte, extend
    cases.append(b[:len(b) - rng.randrange(1, min(9, len(b)))])
    i = rng.randrange(len(b))
    cases.append(b[:i] + bytes([b[i] ^ (1 << rng.randrange(8))])
                 + b[i + 1:])
    cases.append(b + bytes([rng.randrange(256)]))
for _ in range(300):
    cases.append(bytes(rng.randrange(256)
                       for _ in range(rng.randrange(0, 60))))
soup = spark.createDataFrame([(c.hex().upper(),) for c in cases],
                             "blob_hex string")
d2 = add_positional_decode(soup, "blob_hex", URLS,
                           carry=["blob_hex"])
got2 = d2.collect()
bad2 = claimed2 = 0
for r in got2:
    d = r["__rp_d"]
    if d is None:
        continue
    claimed2 += 1
    exp = registry_decode_py(bytes.fromhex(r["blob_hex"]), URLS)
    gotr = (d["type_url"], d["status"], d["amt"], d["pid"], d["yes"],
            d["timeout"])
    if gotr != exp:
        bad2 += 1
        print("SOUP MISMATCH", gotr, "!=", exp,
              "blob:", r["blob_hex"][:120])
        if bad2 > 8:
            break
print(f"soup: {len(got2)} rows, {claimed2} claimed, {bad2} mismatches")

if bad or bad2:
    sys.exit(1)

# ---- 3. throughput at 30× tier ---------------------------------------------
if os.environ.get("PROBE_PERF", "1") == "1":
    src = spark.read.parquet("/tmp/layers_probe_blobs")
    n = src.count()
    print("perf rows:", n)

    def py_query():
        dpy = registry_decoded_struct_py(F.col("blob_hex"))
        return (src.select(dpy.alias("d"))
                .groupBy("d.type_url", "d.status")
                .agg(F.count("*").alias("n"), F.sum("d.amt").alias("amt")))

    def pos_query():
        dd = add_positional_decode(src, "blob_hex", URLS, carry=[])
        return (dd.groupBy("__rp_d.type_url", "__rp_d.status")
                .agg(F.count("*").alias("n"),
                     F.sum("__rp_d.amt").alias("amt")))

    for run in range(2):
        t0 = time.time()
        r = len(py_query().collect())
        print(f"python fresh run {run}: {time.time()-t0:.2f}s ({r})")
    for ws in ("true", "false"):
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        for run in range(3):
            t0 = time.time()
            q = pos_query()
            t1 = time.time()
            r = len(q.collect())
            print(f"positional ws={ws} run {run}: build={t1-t0:.2f}s "
                  f"total={time.time()-t0:.2f}s ({r} groups)", flush=True)
spark.stop()
