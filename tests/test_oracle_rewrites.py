"""Equivalence pins for performance-rewritten DuckDB oracles.

The sf1.0 gate rewrites (VERDICT r11 next #4) replaced two oracle
forms that burned DuckDB time in CTE re-inlining / inequality-only
self-joins. A rewritten oracle shares more algorithmic structure with
the engine plan (bucketed candidate generation), which weakens the
independent-recomputation property — so this module re-anchors each
rewrite to the NAIVE reference predicate at sf0.001, where the naive
form is cheap: the committed oracle must be bit-identical to the
straightforward O(n²) SQL it replaced.
"""

from __future__ import annotations

import duckdb

from zigchain_indexer_clickhouse_spark.catalog import TABLES


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


NAIVE_OVERLAPS = """
    WITH r AS (
      SELECT o_orderkey AS id, o_orderkey * 10 AS s,
             o_orderkey * 10 + 5 + (o_custkey % 30) AS e
      FROM orders WHERE o_orderstatus IN ('O', 'P')
    )
    SELECT a.id AS work_id, COUNT(*) AS n_overlaps
    FROM r a JOIN r b
      ON a.id < b.id AND NOT (b.e < a.s OR a.e < b.s)
    GROUP BY a.id
"""


def test_bucketed_overlap_oracle_matches_naive_predicate(sf_dir):
    """The committed overlapping_ranges oracle (bucket equi-join,
    first-shared-bucket dedup) must return exactly the rows of the
    naive reference predicate `NOT (e2 < s1 OR e1 < s2)` over all
    id-ordered pairs (clickhouse_queries.js:220-229)."""
    from zigchain_indexer_clickhouse_spark.plans import registry

    oracle = registry.oracles()["overlapping_ranges"]
    con = _connect(sf_dir)
    fast = con.execute(
        f"SELECT * FROM ({oracle}) ORDER BY work_id"
    ).fetchall()
    naive = con.execute(
        f"SELECT * FROM ({NAIVE_OVERLAPS}) ORDER BY work_id"
    ).fetchall()
    assert fast == naive
    assert len(fast) > 0  # non-vacuous: overlaps exist at sf0.001
