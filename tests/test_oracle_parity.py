"""Local mirror of the driver's correctness gate: every corpus entry must
match its DuckDB oracle at sf0.001 (driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from spanner_jdbc_converter_spark.oracle import check_query
from spanner_jdbc_converter_spark.plans import ORACLE, QUERIES


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    result = check_query(spark, duck, sf_dir, name)
    assert result.ok, str(result)
