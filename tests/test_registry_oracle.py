"""Oracle-parity tests: every registered query with an oracle must
hash-match DuckDB at sf0.001 — the same gate the driver applies at
sf0.01 (SURVEY.md §5).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from zigchain_indexer_clickhouse_spark.catalog import TABLES
from zigchain_indexer_clickhouse_spark.plans import registry

_QUERIES = registry.queries()
_ORACLES = registry.oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    sdf = _QUERIES[name](spark, sf_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = duck.execute(_ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    sc, sr = _canon(scols, srows)
    dc, dr = _canon(dcols, drows)
    assert sc == dc, f"columns differ: spark={sc} duck={dc}"
    assert len(sr) == len(dr), f"rowcount: spark={len(sr)} duck={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert a == b, f"row {i}: spark={a} duck={b}"


@pytest.mark.parametrize(
    "name", sorted(set(_QUERIES) - set(_ORACLES))
)
def test_rows_only_queries_produce_rows(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert len(df.collect()) > 0, f"{name} returned zero rows"


def test_every_oracle_has_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_inventory_size():
    # SURVEY.md §2 inventory: keep the registry from silently shrinking.
    assert len(_QUERIES) >= 47
