from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigchain_indexer_clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slowbattery: deep conformance battery (positional/Janino, golden "
        "wire vectors, pairwise decode-path equivalence, full-registry "
        "plan sweeps). Skipped by default so the suite fits a CI/driver "
        "window (~13 min); set SPARK_GRAFT_FULL_TESTS=1 to run everything "
        "(~45 min). The skipped tests' SUBJECTS stay covered on the "
        "default path by the per-operator oracle gate "
        "(test_registry_oracle), the native-kernel equivalence tests and "
        "the targeted plan-shape assertions.",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slowbattery: set SPARK_GRAFT_FULL_TESTS=1 for the full "
        "~45 min conformance battery"
    )
    for item in items:
        if "slowbattery" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    # 12g heap for the session-scoped suite JVM: ~880 tests share it,
    # and the accumulated analyzed plans + the 67-type positional
    # dispatch's generated code OOM'd the old (effectively 8g) heap
    # late in the battery — a task-level java.lang.OutOfMemoryError
    # that killed the JVM and cascaded ConnectionRefused through every
    # later test (r12). Overridable via the same env the engine uses.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    s = get_spark("tests", master="local[4]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
