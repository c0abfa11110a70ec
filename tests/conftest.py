"""Shared Spark fixture for the engine test suite.

One session-scoped local[4] SparkSession (AQE + Arrow on, UTC, shuffle=4)
— mirrors the production session factory, sized for tiny test data.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from transmog_spark.session import get_spark

    s = get_spark("local[4]", shuffle_partitions=4, app_name="transmog_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
