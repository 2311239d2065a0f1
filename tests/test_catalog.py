"""Catalog verification — the verifyTables analog."""

from __future__ import annotations

from zigchain_indexer_clickhouse_spark.catalog import TABLES, verify_catalog


def test_verify_catalog_all_ok(spark, sf_dir):
    report = verify_catalog(spark, sf_dir)
    assert set(report) == set(TABLES)
    assert all(v == "ok" for v in report.values()), report


def test_verify_catalog_flags_missing(spark, tmp_path):
    report = verify_catalog(spark, str(tmp_path))
    assert all(v == "missing" for v in report.values())
