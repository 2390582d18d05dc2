"""r11 focused tests: every operator that gained a guarded DRIVER-SIDE
fast path this round must produce bit-identical rows on both paths.

Each test runs the query once normally (sf0.001 sits far below every
guard, so the driver path executes) and once with the guard monkey-
patched to 0 (forcing the distributed loop the 100 TB shape uses), then
compares the collected, canonically-sorted rows."""

from __future__ import annotations

import pytest

from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _run_both(spark, monkeypatch, name, module, attr):
    spec = QUERY_REGISTRY[name]
    fast = _rows(spec.fn(spark, SF_SMOKE))
    monkeypatch.setattr(module, attr, 0)
    slow = _rows(spec.fn(spark, SF_SMOKE))
    assert fast == slow, f"{name}: driver path diverges from distributed path"
    assert fast, f"{name}: vacuous equality (no rows at sf0.001)"


def test_q368_driver_path_equals_distributed(spark, monkeypatch):
    from aws_datalake_platform_spark.plans import training2

    _run_both(
        spark,
        monkeypatch,
        "q368_hits_hubs_authorities",
        training2,
        "_Q368_DRIVER_EDGE_BOUND",
    )


def test_q394_driver_path_equals_distributed(spark, monkeypatch):
    from aws_datalake_platform_spark.plans import training3

    _run_both(
        spark,
        monkeypatch,
        "q394_label_propagation",
        training3,
        "_Q394_DRIVER_EDGE_BOUND",
    )


def test_q382_driver_path_equals_distributed(spark, monkeypatch):
    from aws_datalake_platform_spark.plans import training3

    _run_both(
        spark, monkeypatch, "q382_kcore_peel", training3, "_Q382_DRIVER_EDGE_BOUND"
    )


def test_q426_driver_path_equals_distributed(spark, monkeypatch):
    from aws_datalake_platform_spark.plans import training4

    _run_both(
        spark,
        monkeypatch,
        "q426_facility_location_coreset",
        training4,
        "_Q426_DRIVER_CELL_BOUND",
    )


def test_q337_driver_path_equals_distributed(spark, monkeypatch):
    from aws_datalake_platform_spark.plans import training2

    _run_both(
        spark,
        monkeypatch,
        "q337_zorder_skip_estimate",
        training2,
        "_Q337_DRIVER_ROW_BOUND",
    )


def test_q202_driver_path_equals_distributed(spark, monkeypatch):
    from aws_datalake_platform_spark.operators import similarity

    _run_both(
        spark, monkeypatch, "q202_mmr_rerank", similarity, "_MMR_DRIVER_CAND_BOUND"
    )


def test_build_concurrently_preserves_thunk_order(spark):
    from aws_datalake_platform_spark.plans.queries import build_concurrently

    a, b, c = build_concurrently(
        lambda: spark.range(1).localCheckpoint(eager=True),
        lambda: spark.range(2).localCheckpoint(eager=True),
        lambda: spark.range(3).localCheckpoint(eager=True),
    )
    assert (a.count(), b.count(), c.count()) == (1, 2, 3)


@pytest.mark.parametrize(
    "name",
    [
        "q367_cochran_q",
        "q225_lsh_dedup_audit",
        "q277_detector_agreement",
        "q354_dup_capture_recapture",
    ],
)
def test_threaded_composites_are_deterministic(spark, name):
    """Two runs of each thread-pool composite must agree exactly — the
    pool changes job scheduling, never the pair relations."""
    spec = QUERY_REGISTRY[name]
    r1 = _rows(spec.fn(spark, SF_SMOKE))
    r2 = _rows(spec.fn(spark, SF_SMOKE))
    assert r1 == r2 and r1
