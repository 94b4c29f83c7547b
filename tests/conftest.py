"""Shared pytest fixtures. Spark session is session-scoped (JVM
startup is ~10s); tests that don't need Spark stay pure-Python and
fast."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from kgpipe.session import get_spark

    spark = get_spark(app_name="kgpipe-tests", master="local[4]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
