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


NAIVE_GAPS = """
    WITH present AS (
      SELECT DISTINCT o_orderkey AS height FROM orders WHERE o_orderstatus <> 'O'
    ),
    expected AS (
      SELECT g.h FROM generate_series(0, 10000000) g(h)
      WHERE g.h <= (SELECT MAX(o_orderkey) FROM orders)
    )
    SELECT COUNT(*) AS gap_count,
           CAST(MIN(e.h) AS BIGINT) AS first_gap,
           CAST(MAX(e.h) AS BIGINT) AS last_gap
    FROM expected e LEFT JOIN present p ON e.h = p.height
    WHERE p.height IS NULL
"""


def test_series_free_gap_oracle_matches_naive_series(sf_dir):
    """The r12 series-free gap_detection oracle (gaps-and-islands:
    first/last missing height is always one of {0, mh, present±1})
    must be bit-identical to the naive generate_series + anti-join
    form it replaced (monitor_indexer.js:91-105) — valid to evaluate
    here because sf0.001's max height is far below the naive form's
    10M constant bound. That constant is WHY the rewrite exists: the
    sf1.0 replica's stride-floored heights exceed 10M, silently
    truncating the naive oracle's expected domain (r12 sweep catch)."""
    from zigchain_indexer_clickhouse_spark.plans import registry

    oracle = registry.oracles()["gap_detection"]
    con = _connect(sf_dir)
    fast = con.execute(f"SELECT * FROM ({oracle})").fetchall()
    naive = con.execute(f"SELECT * FROM ({NAIVE_GAPS})").fetchall()
    assert fast == naive
    assert fast[0][0] > 0  # non-vacuous: gaps exist at sf0.001


def test_health_report_gaps_leg_matches_naive_series(sf_dir):
    """monitor_health_report's gaps row carries the same series-free
    rewrite (count + last-gap only); pin it to the naive form too."""
    from zigchain_indexer_clickhouse_spark.plans import registry

    oracle = registry.oracles()["monitor_health_report"]
    con = _connect(sf_dir)
    row = con.execute(
        f"SELECT n, detail FROM ({oracle}) WHERE \"check\" = 'gaps'"
    ).fetchall()
    naive = con.execute(
        f"SELECT gap_count, last_gap FROM ({NAIVE_GAPS})"
    ).fetchall()
    assert row == naive
