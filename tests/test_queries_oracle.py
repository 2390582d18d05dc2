"""Every registered query with an oracle must hash-match DuckDB at sf0.001
(fast) — the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERY_REGISTRY))
def test_query_matches_oracle(spark, con, name):
    spec = QUERY_REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    if spec.sql is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    ok, msg = compare(df, con, spec.sql)
    assert ok, f"{name}: {msg}"
