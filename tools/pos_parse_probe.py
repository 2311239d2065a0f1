"""Round-13 probe: how much of the positional chain's ~78 s first
parse+analyze is one-time JVM work (ANTLR prediction-cache build) that
a DUMMY parse — same SQL shape over a one-row view — can absorb off
the critical path.

Usage:
    python tools/pos_parse_probe.py control   # cold real parse, then repeat
    python tools/pos_parse_probe.py dummy     # dummy parse first, then real

If "REAL chain #1" under dummy mode drops to about the control's
"#2" (repeat) time, the whole first-parse cost is JVM-static and a
background dummy-parse warm recovers it for the gate's hybrid row.
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from zigchain_indexer_clickhouse_spark.catalog import load  # noqa: E402
from zigchain_indexer_clickhouse_spark.session import get_spark  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "control"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

spark = get_spark("pos-parse-probe")
spark.sparkContext.setLogLevel("ERROR")

from zigchain_indexer_clickhouse_spark.sources import tx_decode as td  # noqa: E402
from zigchain_indexer_clickhouse_spark.functions.registry_positional import (  # noqa: E402
    add_positional_decode,
)


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return out


URLS = dict(td._REGISTRY_URL_KEYS)

if MODE == "dummy":
    dummy = spark.createDataFrame([("",)], "blob_hex string")
    t("dummy parse+analyze (1-row view)",
      lambda: add_positional_decode(dummy, "blob_hex", URLS,
                                    carry=["blob_hex"]))

blob = t("blob tree (py4j construction)", td._registry_blob_hex)
base = (load(spark, SF_DIR, "events")
        .filter(F.col("event_id") < td._CONF_EVENT_BOUND)
        .select(blob.alias("blob_hex")))
t("REAL chain parse+analyze #1",
  lambda: add_positional_decode(base, "blob_hex", URLS, carry=["blob_hex"]))
t("REAL chain parse+analyze #2",
  lambda: add_positional_decode(base, "blob_hex", URLS, carry=["blob_hex"]))

heap = spark._jvm.java.lang.Runtime.getRuntime()
print(f"driver heap used: {(heap.totalMemory()-heap.freeMemory())/2**20:.0f}"
      f" MiB / max {heap.maxMemory()/2**20:.0f} MiB", flush=True)
spark.stop()
