"""Round-13 micro-probe: split the decode-family driver costs into
construction (py4j), SQL-text extraction+reparse (F.expr), analysis
(schema resolution), and stacked-analysis over an analyzed child.
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from zigchain_indexer_clickhouse_spark.catalog import load  # noqa: E402
from zigchain_indexer_clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("decode_component_probe")
spark.sparkContext.setLogLevel("ERROR")

from zigchain_indexer_clickhouse_spark.sources import tx_decode as td  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return out


e = load(spark, SF_DIR, "events")

blob = t("build _registry_blob_hex (py4j construction)",
         td._build_registry_blob_hex)

sel = e.select(blob.alias("blob_hex"))
t("analysis of events.select(blob_hex) [.schema]", lambda: sel.schema)
sel2 = e.filter(F.col("event_id") < 7200).select(blob.alias("blob_hex"))
t("analysis of a SECOND fresh select over the same tree",
  lambda: sel2.schema)
stacked = sel.filter("length(blob_hex) > 0")
t("analysis stacked on the ALREADY-analyzed frame", lambda: stacked.schema)

# NOTE: Spark 4 removed Column._jc.expr() (the JVM Column wraps a
# ColumnNode; see _jc.node()), so the SQL-text round-trip experiment
# that would quantify an ANTLR-reparse path is not available here —
# the node tree has no public .sql() renderer.

fields = t("build _registry_decoded_fields (py4j construction)",
           lambda: td._registry_decoded_fields(F.col("type_url"),
                                               F.col("scan")))
struct_tree = t("build registry_decoded_struct (py4j construction)",
                lambda: td.registry_decoded_struct(F.col("blob_hex")))

from zigchain_indexer_clickhouse_spark.functions.native_registry import (  # noqa: E402
    native_available,
)

t("native kernel availability/compile", native_available)

heap = spark._jvm.java.lang.Runtime.getRuntime()
print(f"  driver heap used: "
      f"{(heap.totalMemory()-heap.freeMemory())/2**20:.0f} MiB "
      f"/ max {heap.maxMemory()/2**20:.0f} MiB", flush=True)

spark.stop()
