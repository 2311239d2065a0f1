"""Probe 3: honest repeat-timing of the Python registry path — is the
0.04s 'warm' number real work or an artifact?"""
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from zigchain_indexer_clickhouse_spark.sources.tx_decode import (  # noqa: E402
    registry_decoded_struct_py,
)

src = spark.read.parquet("/tmp/layers_probe_blobs")
print("rows:", src.count())

for run in range(3):
    t0 = time.time()
    dpy = registry_decoded_struct_py(F.col("blob_hex"))
    rpy = (src.select(dpy.alias("d"))
           .groupBy("d.type_url", "d.status")
           .agg(F.count("*").alias("n"),
                F.sum("d.amt" if run != 1 else "d.pid").alias("agg")))
    rows = rpy.collect()
    print(f"python run {run}: {time.time()-t0:.2f}s groups={len(rows)}")

# same df object recollect (the suspicious case)
t0 = time.time()
rpy.collect()
print(f"same-object recollect: {time.time()-t0:.2f}s")
spark.stop()
