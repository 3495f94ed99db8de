"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from robin_sparkles_spark.session import get_spark

    # Small core/partition budget: test inputs are tiny, scheduling
    # overhead dominates above ~8 local threads.
    spark = get_spark(
        app_name="robin_sparkles_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
