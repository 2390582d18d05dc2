"""Permanent 1-row / 2-row degenerate-lake parity sweeps (VERDICT r9
item 3).

scripts/degenerate_probe.py found 52 real crashes across rounds 8-10
(n-1 / n-2 dof divide-by-zero classes, zero-variance statistics), but
as a script it only runs when someone remembers. These sweeps pin the
rows-1 and rows-2 rows of the degenerate matrix as ordinary tests, the
same way tests/test_empty_inputs.py pins rows-0. The constant lake
(--rows 1 --repeat 32) stays a script: its six duplicate-PK artifact
queries now raise DuplicateKeyError by design (tests/test_pk_guard.py
covers that contract), and the remaining zero-variance classes are
reachable only with the probe's repeat knob.

Deselect with ``-m "not degenerate"`` when iterating on something else.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from aws_datalake_platform_spark.catalog import TESTDATA_TABLES
from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module", params=[1, 2], ids=["rows1", "rows2"])
def tiny_lake(request, tmp_path_factory):
    """First N rows of every sf0.001 table, written with pyarrow so the
    original parquet schemas survive for DuckDB's view-per-file oracle."""
    dst = tmp_path_factory.mktemp(f"tiny_lake_{request.param}")
    for t in TESTDATA_TABLES:
        src = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        pq.write_table(src.slice(0, request.param), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.mark.degenerate
def test_every_oracle_matches_on_tiny_lake(spark, tiny_lake):
    """Full driver-style compare (count + schema + values + pandas
    representation) for every oracle-backed query on an N-row lake,
    collecting every failure so one regression doesn't hide the rest."""
    con = duckdb_conn(tiny_lake)
    fails = []
    for name, spec in sorted(QUERY_REGISTRY.items()):
        if spec.sql is None:
            continue
        try:
            ok, msg = compare(spec.fn(spark, tiny_lake), con, spec.sql)
        except Exception as ex:
            ok, msg = False, f"{type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
        if not ok:
            fails.append(f"{name}: {msg[:160]}")
    assert not fails, "\n".join(fails)
