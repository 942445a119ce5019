from __future__ import annotations

import pytest

from spanner_jdbc_converter_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck(sf_dir):
    from spanner_jdbc_converter_spark.oracle import duckdb_connection

    con = duckdb_connection(sf_dir)
    yield con
    con.close()
