"""Engine-wide empty-input robustness: EVERY registered query must run
against an empty lake (all tables present, zero rows) and return a
schema-stable, zero-or-more-row result — no operator may crash on
nothing. Extends the reference's empty-input guard (S5,
batch_ingest/lambda_function.py behavior on zero readings) from the two
pipelines to the whole query surface."""

from __future__ import annotations

import pytest

from aws_datalake_platform_spark.catalog import TESTDATA_TABLES, load_table
from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TESTDATA_TABLES:
        load_table(spark, SF_SMOKE, t).limit(0).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


def test_every_query_survives_empty_lake(spark, empty_sf):
    fails = []
    for name, spec in sorted(QUERY_REGISTRY.items()):
        try:
            assert spec.fn(spark, empty_sf).count() >= 0
        except Exception as ex:  # collect all, report once
            fails.append(f"{name}: {type(ex).__name__}: {str(ex).splitlines()[0][:120]}")
    assert not fails, "\n".join(fails)
