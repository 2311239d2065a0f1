"""Round-13 decode-memo machinery: the background warm and the
lock-guarded getters must hand every caller the SAME immutable tree,
and the conditional conformance-stage retention must key on driver
heap exactly like the hybrid profile does.
"""

from __future__ import annotations

import threading

from zigchain_indexer_clickhouse_spark.sources import tx_decode as td


def test_warm_is_idempotent_and_getters_converge(spark):
    # idempotent: a second call must not spawn a second build wave
    td.warm_expression_memos_async()
    td.warm_expression_memos_async()
    # getters from several threads converge on ONE object per memo
    # (the double-checked locks make a mid-build caller block, never
    # duplicate the 30-50 s construction)
    results = []

    def grab():
        results.append((id(td._registry_blob_hex()),
                        id(td._registry_decoded_fields_cols())))

    threads = [threading.Thread(target=grab) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(set(results)) == 1
    # and the memoized objects are what the getters return thereafter
    assert td._registry_blob_hex() is td._BLOB_HEX_MEMO
    assert (td._registry_decoded_fields_cols()
            is td._DECODED_FIELDS_COLS_MEMO)


def test_conformance_retention_keys_on_heap(spark):
    # the suite session runs ≥4 GiB, so retention is on here; the
    # 1 GiB vanilla-gate protection stays for small heaps (same bound
    # as _hybrid_profile's "full" tier)
    gib = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory()) / 1024**3
    assert td._can_retain_conformance_stages(spark) == (gib >= 4.0)
