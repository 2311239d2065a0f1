"""Probe: do chained selects with multi-referenced non-cheap aliases
survive CollapseProject as bound locals (linear plan), or inline into
an exponential tree?  Decides the layered-codegen-walker design for
the round-10 hybrid registry decode.

Run: python tools/layer_collapse_probe.py [layers] [rows]
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F

layers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# conv('') behavior check
r = spark.sql(
    "select conv('', 16, 10) as a, conv(substr('0a12', 9, 2), 16, 10) as b,"
    " cast(conv('', 16, 10) as int) as c"
).collect()[0]
print("conv(''):", repr(r.a), "substr-past-end conv:", repr(r.b), "cast:", r.c)

df = spark.range(rows).select(
    (F.col("id") % 1000).alias("x"),
    F.hex(F.concat(
        F.lit(bytes.fromhex("0a")),
        F.lit(b"\x10"),
        F.encode(F.concat(F.lit("addr"), (F.col("id") % 97).cast("string")),
                 "UTF-8").cast("binary"),
    )).alias("h"),
)

# each layer: pos_i depends on pos_{i-1} referenced SEVERAL times through
# non-cheap exprs (conv+substr), mimicking one walk step
cur = df.select("*", F.lit(1).cast("bigint").alias("pos0"))
for i in range(1, layers + 1):
    p = F.col(f"pos{i-1}")
    b0 = F.conv(F.substr(F.col("h"), p, F.lit(2)), 16, 10).cast("bigint")
    b1 = F.conv(F.substr(F.col("h"), p + 2, F.lit(2)), 16, 10).cast("bigint")
    b2 = F.conv(F.substr(F.col("h"), p + 4, F.lit(2)), 16, 10).cast("bigint")
    step = (
        F.when(b0 < 128, b0 + b1)
        .when(b1 < 128, b0 * 2 + b2)
        .otherwise(b2 - b0 + p % 7)
    )
    cur = cur.select("*", (p + 2 + F.pmod(step, F.lit(4))).alias(f"pos{i}"))

out = cur.select("x", F.col(f"pos{layers}").alias("fin"))
t0 = time.time()
plan = out._jdf.queryExecution().executedPlan().toString()
t1 = time.time()
print(f"analysis+planning: {t1-t0:.2f}s  plan chars: {len(plan)}")
print(plan[:1500])

t0 = time.time()
res = out.groupBy().agg(F.sum("fin")).collect()
t1 = time.time()
print(f"exec {rows} rows x {layers} layers: {t1-t0:.2f}s   result {res}")

# second run (warm)
t0 = time.time()
out.groupBy().agg(F.sum("fin")).collect()
print(f"warm repeat: {time.time()-t0:.2f}s")
spark.stop()
