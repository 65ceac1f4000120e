"""The local twin of the driver's correctness gate: every SQL-expressible
registry query must hash-match its DuckDB oracle on the fixtures."""

import pytest

from datalakehouse_spark.oracle_check import compare_query
from datalakehouse_spark.registry import REGISTRY, _load_extensions

_load_extensions()

SQL_QUERIES = [(n, s) for n, s in REGISTRY.items() if s.sql is not None]


@pytest.mark.parametrize("name,spec", SQL_QUERIES, ids=[n for n, _ in SQL_QUERIES])
def test_oracle_match(spark, sf_small, name, spec):
    res = compare_query(spark, sf_small, name, spec.fn, spec.sql)
    assert res.ok, (
        f"{name}: rows {res.spark_rows}/{res.oracle_rows} "
        f"schema_match={res.schema_match} value_match={res.value_match} {res.detail}"
    )
