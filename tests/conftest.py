"""Shared Spark session for the test suite (one JVM for the whole run)."""

from __future__ import annotations

import os

import pytest

from zx_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("ZX_SHUFFLE_PARTITIONS", "4")
    s = get_spark("zx_spark_tests")
    yield s
