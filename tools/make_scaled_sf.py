"""Deterministic N× replica of a driver test-data scale factor.

The driver ships sf0.001/sf0.01/sf0.1; VERDICT r9/r10 ask for one full
oracle sweep at 10× bench scale (sf1.0) to catch output-scaling bug
classes (the sf0.1 sweep caught q2 in r2). /root/testdata is read-only,
so this tool materializes the scaled set elsewhere: each fact table is
UNION ALL of N copies with every primary/foreign key shifted by
copy_index × (max_key + 1) — referential integrity is preserved copy-
wise, and region/nation stay fixed (the TPC-H scaling rule; nationkey
references remain valid). Non-key columns repeat exactly: the gate
compares Spark and DuckDB over the SAME parquet, so replica texture is
irrelevant to correctness, and the 10× duplicate mass is itself a
useful stress for the dedup family.

Timestamps come back out as TIMESTAMP(MICROS) — the second of the
three generations catalog.load explicitly supports.

Usage: python tools/make_scaled_sf.py [src_dir] [dst_dir] [factor]
       (defaults: /root/testdata/sf0.1 /tmp/sf1.0 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {column: key_domain}; a domain's stride is max(domain)+1
# over its defining table in the source data
KEYS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
DOMAIN_DEF = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
COPY_AS_IS = ("region", "nation")


def make_scaled(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # stride floor 10M: several operators synthesize derived ids at
    # fixed offsets from real ones (e.g. the near-dup corpus plants
    # copies at doc_id + 10000), so copy strides must clear every such
    # offset or replica ids collide with planted ids and the op/oracle
    # pair sees a corpus the sf0.1 originals never produce
    strides = {
        dom: max(con.execute(
            f"SELECT max({col}) + 1 FROM '{src}/{tbl}.parquet'"
        ).fetchone()[0], 10_000_000)
        for dom, (tbl, col) in DOMAIN_DEF.items()
    }
    for t in COPY_AS_IS:
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied as-is")
    for t, keycols in KEYS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        selects = []
        for i in range(factor):
            exprs = []
            for c in cols:
                if c in keycols:
                    exprs.append(
                        f"{c} + {i} * {strides[keycols[c]]} AS {c}")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet'")
        con.execute(f"COPY ({' UNION ALL '.join(selects)}) "
                    f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({factor}x)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_scaled(src, dst, factor)
