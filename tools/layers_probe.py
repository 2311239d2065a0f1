"""Probe 2: layered walker vs Python walk() — equivalence on crafted +
random bytes, then throughput at 3M rows (walk-only, 2+8 layers)."""
import os
import random
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import SparkSession, functions as F  # noqa: E402

from zigchain_indexer_clickhouse_spark.functions.protobuf_layers import (  # noqa: E402
    add_walk,
)
from zigchain_indexer_clickhouse_spark.functions.protobuf_py import walk  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# ---- equivalence on a byte soup -------------------------------------------
rng = random.Random(42)
cases = []
# crafted: canonical msgs, truncations, 2-byte tags, fixed32/64, big varints
crafted = [
    b"",
    b"\x0a\x03abc\x12\x02hi",
    b"\x08\x96\x01",                      # varint 150
    b"\x08\xff\xff\xff\xff\xff\xff\xff\xff\x7f",  # 9-byte varint max
    b"\x08\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01",  # 10-byte: fail
    b"\x0d\x01\x02\x03\x04",              # fixed32
    b"\x09\x01\x02\x03\x04\x05\x06\x07\x08",  # fixed64 top bit set: fail
    b"\x09\x01\x02\x03\x04\x05\x06\x07\x78",  # fixed64 ok
    b"\x12\x7f" + b"x" * 127,              # len 127 payload (short blob: fail)
    b"\x12\x04toolong",                    # len < payload: trailing junk
    b"\xf8\x7f\x01",                       # 2-byte tag field 2047 wt 0
    b"\xf8\xff\x01\x01",                   # 3-byte tag: fail
    b"\x03\x01",                           # wt 3: fail
    b"\x0a\x02hi" * 5,                     # 5 repeats of field 1
    b"\x0a\x02hi" * 9,                     # > max_fields: fail
    b"\x12\x81\x80\x80\x80\x80\x80\x80\x80\x40",  # wt2 len 2^62: fail closed
    b"\x00\x01",                           # field 0: fail
    b"\x08",                               # tag then nothing: fail
]
cases += crafted
for _ in range(400):
    n = rng.randrange(0, 40)
    cases.append(bytes(rng.randrange(256) for _ in range(n)))
# biased soup: valid-ish prefixes
for _ in range(200):
    parts = []
    for _f in range(rng.randrange(1, 5)):
        fno = rng.randrange(1, 4)
        wt = rng.choice([0, 2, 5, 1])
        parts.append(bytes([(fno << 3) | wt]))
        if wt == 0:
            v = rng.randrange(0, 1 << 40)
            while True:
                b = v & 0x7F
                v >>= 7
                parts.append(bytes([b | (0x80 if v else 0)]))
                if not v:
                    break
        elif wt == 2:
            ln = rng.randrange(0, 10)
            parts.append(bytes([ln]) + bytes(ln))
        elif wt == 5:
            parts.append(bytes(4))
        else:
            parts.append(bytes(7) + bytes([rng.randrange(128)]))
    cases.append(b"".join(parts))

K = 8
pdf = spark.createDataFrame(
    [(i, c.hex().upper()) for i, c in enumerate(cases)], "i int, h string")
d, w = add_walk(pdf, F.col("h"), "t", K)
sel = [F.col("i"), w.ok().alias("ok")]
for fno in range(0, 5):
    sel.append(w.ld_arr(fno).alias(f"ld{fno}"))
    sel.append(w.vi(fno).alias(f"vi{fno}"))
got = {r["i"]: r for r in d.select(*sel).collect()}

bad = 0
for i, c in enumerate(cases):
    ok, ld, vi = walk(c, K)
    g = got[i]
    exp_ld = {f: [p.hex().upper() for p in ps] for f, ps in ld.items()}
    for fno in range(0, 5):
        if list(g[f"ld{fno}"] or []) != exp_ld.get(fno, []):
            bad += 1
            print(f"LD MISMATCH i={i} fno={fno} blob={c.hex()} "
                  f"got={g[f'ld{fno}']} exp={exp_ld.get(fno)}")
            break
        if g[f"vi{fno}"] != vi.get(fno):
            bad += 1
            print(f"VI MISMATCH i={i} fno={fno} blob={c.hex()} "
                  f"got={g[f'vi{fno}']} exp={vi.get(fno)}")
            break
    else:
        if bool(g["ok"]) != ok:
            bad += 1
            print(f"OK MISMATCH i={i} blob={c.hex()} got={g['ok']} exp={ok}")
print(f"equivalence: {len(cases)} cases, {bad} mismatches")

# ---- throughput: 3M realistic msgs, Any(2) + body(8) ----------------------
rows = int(os.environ.get("PROBE_ROWS", "3000000"))
base = spark.range(rows).select(
    F.col("id").alias("event_id"),
    (F.col("id") % 9999).alias("user_id"),
    ((F.col("id") % 1000) / 7.0).alias("value"),
)
from zigchain_indexer_clickhouse_spark.sources.tx_decode import (  # noqa: E402
    _registry_blob_hex, registry_decoded_struct_py,
)
blobs = base.select(_registry_blob_hex().alias("blob_hex"))
blobs.write.mode("overwrite").parquet("/tmp/layers_probe_blobs")
src = spark.read.parquet("/tmp/layers_probe_blobs")
print("rows:", src.count())

def py_query():
    dpy = registry_decoded_struct_py(F.col("blob_hex"))
    return (src.select(dpy.alias("d"))
            .groupBy("d.type_url", "d.status")
            .agg(F.count("*").alias("n"), F.sum("d.amt").alias("amt"))
            .orderBy("type_url", "status"))


def layer_query():
    d1, wa = add_walk(src, F.col("blob_hex"), "a", 2, carry=[])
    d1, wb = add_walk(d1, wa.l1(2), "b", 8, carry=wa.keep_cols())
    out = d1.select(
        F.decode(F.unhex(wa.l1(1)), "UTF-8").alias("type_url"),
        wb.ok().alias("s_ok"),
        wb.vi(1).alias("v1"),
        F.length(wb.l1(3)).alias("p3len"),
    )
    return (out.groupBy("type_url")
            .agg(F.count("*").alias("n"), F.sum("v1").alias("sv"),
                 F.sum("p3len").alias("sp"),
                 F.sum(F.when(F.col("s_ok"), 1).otherwise(0)).alias("nok"))
            .orderBy("type_url"))


for run in range(3):
    t0 = time.time()
    n = len(py_query().collect())
    print(f"python fresh-plan run {run}: {time.time()-t0:.2f}s ({n} groups)")
for run in range(3):
    t0 = time.time()
    n = len(layer_query().collect())
    print(f"layered fresh-plan run {run}: {time.time()-t0:.2f}s ({n} groups)")
q = layer_query()
plan = q._jdf.queryExecution().executedPlan().toString()
print("plan chars:", len(plan), " codegen spans:",
      plan.count("WholeStageCodegen"))
spark.stop()
