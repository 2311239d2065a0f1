"""Round-13 probe: where does the decode-family gate time go?

Times each decode-family operator at sf0.01 in ONE process, twice:
construction (fn call — includes any eager analysis / in-fn collect)
and execution (count of the returned frame). The second invocation
shows what the process-level memos already save. Run on an idle box.
"""
import sys
import time

sys.path.insert(0, ".")

from zigchain_indexer_clickhouse_spark.plans import registry  # noqa: E402
from zigchain_indexer_clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OPS = (
    "msg_registry_decode",
    "msg_registry_decode_hybrid",
    "msg_registry_decode_walker",
    "registry_decode_at_rest",
    "stream_registry_decode",
)

spark = get_spark("decode_gate_probe")
spark.sparkContext.setLogLevel("ERROR")
qs = registry.queries()
registry.oracles()  # gate flow: starts the background memo warm (r13)

for rnd in (1, 2):
    print(f"--- invocation round {rnd} ---", flush=True)
    for name in OPS:
        spark.sparkContext.setJobDescription(f"probe:{name}:r{rnd}")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t1 = time.perf_counter()
        n = df.count()
        t2 = time.perf_counter()
        print(f"{name}: construct={t1-t0:.2f}s execute={t2-t1:.2f}s "
              f"rows={n}", flush=True)
spark.stop()
