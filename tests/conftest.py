from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep unit tests light

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from dataframes_jl_spark.session import get_spark

    s = get_spark(app_name="djs-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from dataframes_jl_spark.session import load_tables

    return load_tables(spark, SF_DIR)
