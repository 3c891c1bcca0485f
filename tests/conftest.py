"""Shared pytest fixtures — ONE SparkSession for the whole run (JVM start is
~20 s; per-test sessions would dominate runtime)."""

from __future__ import annotations

import pytest

from bistro_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app_name="bistro_spark_tests",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def rows_as_dicts(df):
    return [r.asDict(recursive=True) for r in df.collect()]
