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


# Queries allowed to return 0 rows at sf0.001 — must stay empty and each
# needs a written reason. A 0-row oracle match proves nothing (VERDICT r3:
# q182 was vacuously green), so every other query must be non-empty.
EMPTY_OK: dict[str, str] = {}


@pytest.mark.parametrize("name", sorted(QUERY_REGISTRY))
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


def test_decimal_widths_match_oracle(spark, con):
    """Engines widen decimal aggregates differently (Spark sum(DEC(18,2))
    → DEC(28,2), DuckDB → DEC(38,2)); the driver hashes Arrow-typed
    values, so width alone can flip a hash on value-identical results
    (r3's q76). Every decimal-emitting query must pin its output width
    to the same Arrow type both engines produce."""
    import pyspark.sql.types as T

    checked = 0
    for name, spec in sorted(QUERY_REGISTRY.items()):
        if spec.sql is None:
            continue
        df = spec.fn(spark, SF_SMOKE)
        dec_cols = {
            f.name: (f.dataType.precision, f.dataType.scale)
            for f in df.schema.fields
            if isinstance(f.dataType, T.DecimalType)
        }
        if not dec_cols:
            continue
        checked += 1
        arrow = con.execute(spec.sql).fetch_arrow_table().schema
        for col, (prec, scale) in dec_cols.items():
            fld = arrow.field(col)
            assert str(fld.type) == f"decimal128({prec}, {scale})", (
                f"{name}.{col}: spark DECIMAL({prec},{scale}) vs oracle {fld.type}"
            )
    assert checked >= 2  # q76, q157 at minimum — sweep must actually run
