"""Every registered query with an oracle must hash-match DuckDB at sf0.001
(fast) — the local mirror of the driver's correctness gate.

Tiering (VERDICT r10 item 2): queries whose execution strategy changed
since their last driver-green round (the ``_reverify`` front in
``__spark_entry__``) always run in the default fast tier; rows already
hash-certified by a past driver gate carry ``-m full`` and run behind
``pytest -m full`` so the default gate completes inside the driver's
window. The front is read from the same function the driver-facing
ordering uses, so the fast tier tracks the changed-query set with no
manual list."""

from __future__ import annotations

import pytest

from __spark_entry__ import _reverify
from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


# Queries allowed to return 0 rows at sf0.001 — must stay empty and each
# needs a written reason. A 0-row oracle match proves nothing (VERDICT r3:
# q182 was vacuously green), so every other query must be non-empty.
EMPTY_OK: dict[str, str] = {}

# Changed-but-not-yet-driver-certified queries: always in the fast tier.
_FRONT = set(_reverify())


@pytest.mark.parametrize(
    "name",
    [
        n if n in _FRONT else pytest.param(n, marks=pytest.mark.full)
        for n in sorted(QUERY_REGISTRY)
    ],
)
def test_query_matches_oracle(spark, con, name):
    spec = QUERY_REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    if spec.sql is None:
        assert df.count() > 0, f"{name}: rows-only query returned 0 rows"
        return
    ok, msg = compare(df, con, spec.sql)
    assert ok, f"{name}: {msg}"
    if name not in EMPTY_OK:
        # rows_match already passed, so the oracle count == spark count;
        # one EXISTS probe on the DuckDB side is enough to rule vacuous out.
        nonempty = con.execute(f"SELECT EXISTS (SELECT 1 FROM ({spec.sql}))").fetchone()[0]
        assert nonempty, f"{name}: oracle returns 0 rows at sf0.001 — vacuous correctness"


def test_compare_repr_catches_both_r4_driver_failure_classes(spark, con):
    """The strict compare must flag exactly the two classes the driver
    failed on in r4 while the value-only compare said 'ok': DECIMAL
    outputs (q76 — values bit-identical, typed hash red) and nested
    cells (q196 — canonicalizer TypeError). Both engines return the SAME
    values here; only representation differs."""
    dec_sql = "SELECT CAST(1.50 AS DECIMAL(18,2)) AS total"
    ok, msg = compare(spark.sql(dec_sql), con, dec_sql)
    assert not ok and "decimal" in msg, msg

    ok2, msg2 = compare(spark.sql("SELECT array(1, 2) AS positions"), con, "SELECT [1, 2] AS positions")
    assert not ok2 and "nested" in msg2, msg2

    # and the whitelisted normalization stays green: tz-naive µs Spark
    # timestamps vs DuckDB timestamps (q102/q116 driver-green precedent)
    ts_sql = "SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts"
    ok3, msg3 = compare(spark.sql(ts_sql), con, ts_sql)
    assert ok3, msg3


@pytest.mark.full
def test_no_decimal_or_nested_output_columns(spark):
    """The driver hashes PANDAS-TYPED frames: Spark toPandas() renders
    DECIMAL as object/Decimal while DuckDB fetchdf() renders float64, a
    dtype-kind gap no width pin can close (q76 was proven value- and
    Arrow-schema-identical in r4 and still hash-flipped), and list/map
    cells crash the driver's sort_values canonicalizer outright (q196,
    r4). So the invariant is representational: NO oracle-checked query
    may emit DECIMAL, ARRAY, MAP, or STRUCT output columns — decimal
    math stays internal, projected to DOUBLE or exact integer sub-units;
    collections are serialized to strings."""
    import pyspark.sql.types as T

    banned = (T.DecimalType, T.ArrayType, T.MapType, T.StructType)
    offenders = []
    for name, spec in sorted(QUERY_REGISTRY.items()):
        if spec.sql is None:
            continue
        df = spec.fn(spark, SF_SMOKE)
        offenders += [
            f"{name}.{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, banned)
        ]
    assert not offenders, f"driver-unhashable output columns: {offenders}"
