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


@pytest.fixture(scope="module")
def empty_sf_files(tmp_path_factory):
    """Empty lake as SINGLE parquet files (pyarrow, original schemas
    preserved) so DuckDB's view-per-file oracle harness can read it."""
    import pyarrow.parquet as pq

    dst = tmp_path_factory.mktemp("empty_sf_files")
    for t in TESTDATA_TABLES:
        src = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        pq.write_table(src.slice(0, 0), str(dst / f"{t}.parquet"))
    return str(dst)


def test_every_oracle_matches_on_empty_lake(spark, empty_sf_files):
    """Plan/oracle EMPTY-LAKE parity for the whole registry (ADVICE r7
    q415/q421, generalized): the driver's hash gate only ever runs on
    populated fixtures, so a divergence on an empty or truncated lake —
    oracle emitting NULL rows from SUM-over-empty, Spark throwing an
    ANSI divide-by-zero the count()-only sweep above cannot surface,
    rollup grand-total rows — stays latent until a real lake hits it.
    This sweep runs the full compare (count + schema + values) against
    DuckDB on an all-empty lake, collecting every failure."""
    from .oracle import compare, duckdb_conn

    con = duckdb_conn(empty_sf_files)
    fails = []
    for name, spec in sorted(QUERY_REGISTRY.items()):
        if spec.sql is None:
            continue
        try:
            ok, msg = compare(spec.fn(spark, empty_sf_files), con, spec.sql)
        except Exception as ex:
            ok, msg = False, f"{type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
        if not ok:
            fails.append(f"{name}: {msg[:160]}")
    assert not fails, "\n".join(fails)
