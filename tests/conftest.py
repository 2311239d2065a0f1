from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigchain_indexer_clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


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
