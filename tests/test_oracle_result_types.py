"""Guard against the r4 driver hash-fail class: DuckDB types any
integer ``SUM`` as HUGEINT (int128), and the driver's value hasher
serializes HUGEINT differently than Spark's ``long`` even when the
numbers are equal — so an oracle whose OUTPUT contains an un-cast
integer SUM fails the hash gate with rows_match=True. Same risk for
DECIMAL outputs (DuckDB AVG over DECIMAL, etc.).

This test DESCRIBEs every registered oracle under DuckDB at sf0.001
and asserts no result column is HUGEINT/UHUGEINT/DECIMAL — making the
class unrecreatable. It would have caught all six r4 failures
(q15_top_supplier, q11_value_concentration, q12_priority_by_class,
msg_body_decode, rpc_fetch_ingest, stream_mv_daily).
"""

from __future__ import annotations

import duckdb
import pytest

from zigchain_indexer_clickhouse_spark.catalog import TABLES
from zigchain_indexer_clickhouse_spark.plans import registry

_ORACLES = registry.oracles()

# Driver-hash-unsafe DuckDB result types. HUGEINT comes from un-cast
# integer SUM; DECIMAL from decimal arithmetic — both take a different
# Arrow serialization path than Spark's long/double.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_output_types_hash_safe(name, duck):
    rows = duck.execute(f"DESCRIBE {_ORACLES[name]}").fetchall()
    bad = [
        (col, ctype)
        for col, ctype, *_ in rows
        if any(f in ctype.upper() for f in _FORBIDDEN)
    ]
    assert not bad, (
        f"{name}: oracle result column(s) {bad} use a driver-hash-unsafe "
        f"DuckDB type — wrap the expression in CAST(... AS BIGINT) (or "
        f"DOUBLE) so the hash matches Spark's output"
    )
