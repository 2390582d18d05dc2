"""Materialized dedup-audit layer (pipelines/audit_index.py).

The contract: every ``*_from_index`` audit twin is BIT-IDENTICAL to its
fresh registry counterpart — same rows, same values — while reading the
stored relations instead of re-running the detectors. Fresh results are
each computed once here and compared against the index-backed twin, so
any drift between a fresh query's plan and the materialized layer fails
loudly.
"""

from __future__ import annotations

import pytest

from aws_datalake_platform_spark.pipelines.audit_index import (
    cluster_agreement_from_index,
    cochran_q_from_index,
    corpus_scorecard_from_index,
    detector_agreement_from_index,
    dup_capture_recapture_from_index,
    dup_cluster_histogram_from_index,
    golden_record_from_index,
    materialize_dedup_index,
)
from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dedup_index"))
    report = materialize_dedup_index(spark, SF, d)
    assert set(report) == {
        "minhash_pairs",
        "simhash_pairs",
        "ngram_pairs",
        "dup_clusters",
    }
    assert all(info["version"] == 1 for info in report.values())
    return d


def test_index_relations_match_fresh_detectors(spark, index_dir):
    """The stored relations ARE the detector outputs (q24/q25/q23) and
    the stored cluster relation IS q68 — not approximations of them."""
    from aws_datalake_platform_spark.operators.snapshots import read_snapshot

    for table, query in [
        ("minhash_pairs", "q24_minhash_lsh_dedup"),
        ("simhash_pairs", "q25_simhash_dedup"),
        ("ngram_pairs", "q23_ngram_jaccard_dedup"),
        ("dup_clusters", "q68_dup_clusters"),
    ]:
        stored = read_snapshot(spark, f"{index_dir}/{table}")
        fresh = QUERY_REGISTRY[query].fn(spark, SF)
        assert _rows(stored) == _rows(fresh), table


def test_dup_cluster_histogram_from_index_equals_q214(spark, index_dir):
    fresh = QUERY_REGISTRY["q214_dup_cluster_histogram"].fn(spark, SF)
    twin = dup_cluster_histogram_from_index(spark, SF, index_dir)
    assert twin.columns == fresh.columns
    assert _rows(twin) == _rows(fresh)


def test_golden_record_from_index_equals_q243(spark, index_dir):
    fresh = QUERY_REGISTRY["q243_golden_record"].fn(spark, SF)
    twin = golden_record_from_index(spark, SF, index_dir)
    assert twin.columns == fresh.columns
    assert _rows(twin) == _rows(fresh)


def test_detector_agreement_from_index_equals_q277(spark, index_dir):
    fresh = QUERY_REGISTRY["q277_detector_agreement"].fn(spark, SF)
    twin = detector_agreement_from_index(spark, index_dir)
    assert twin.columns == fresh.columns
    assert _rows(twin) == _rows(fresh)


def test_corpus_scorecard_from_index_equals_q300(spark, index_dir):
    fresh = QUERY_REGISTRY["q300_corpus_scorecard"].fn(spark, SF)
    twin = corpus_scorecard_from_index(spark, SF, index_dir)
    assert twin.columns == fresh.columns
    assert _rows(twin) == _rows(fresh)


def test_cluster_agreement_from_index_equals_q349(spark, index_dir):
    fresh = QUERY_REGISTRY["q349_cluster_agreement"].fn(spark, SF)
    twin = cluster_agreement_from_index(spark, SF, index_dir)
    assert twin.columns == fresh.columns
    assert _rows(twin) == _rows(fresh)


def test_dup_capture_recapture_from_index_equals_q354(spark, index_dir):
    fresh = QUERY_REGISTRY["q354_dup_capture_recapture"].fn(spark, SF)
    twin = dup_capture_recapture_from_index(spark, index_dir)
    assert twin.columns == fresh.columns
    assert _rows(twin) == _rows(fresh)


def test_cochran_q_from_index_equals_q367(spark, index_dir):
    fresh = QUERY_REGISTRY["q367_cochran_q"].fn(spark, SF)
    twin = cochran_q_from_index(spark, index_dir)
    assert twin.columns == fresh.columns
    assert _rows(twin) == _rows(fresh)


def test_split_leakage_from_index_equals_q417(spark, index_dir):
    from aws_datalake_platform_spark.pipelines.audit_index import (
        split_leakage_from_index,
    )

    fresh = QUERY_REGISTRY["q417_split_leakage_audit"].fn(spark, SF)
    twin = split_leakage_from_index(spark, SF, index_dir)
    assert twin.columns == fresh.columns
    assert _rows(twin) == _rows(fresh)
    # the structural claim: cluster-keyed splitting cannot leak
    rows = {r["scheme"]: r for r in fresh.collect()}
    assert rows["by_cluster"]["n_cross_pairs"] == 0
    assert rows["by_cluster"]["leak_rate_pct"] == 0.0
    assert rows["by_doc"]["n_dup_pairs"] == rows["by_cluster"]["n_dup_pairs"]


def test_rematerialize_versions_and_time_travel(spark, index_dir):
    """Re-materializing commits version 2 per table; the audits accept
    an explicit version (time-travel over the index history)."""
    report = materialize_dedup_index(spark, SF, index_dir)
    assert all(info["version"] == 2 for info in report.values())
    v1 = dup_cluster_histogram_from_index(spark, SF, index_dir, version=1)
    v2 = dup_cluster_histogram_from_index(spark, SF, index_dir, version=2)
    assert _rows(v1) == _rows(v2)  # same corpus -> same relations


def test_cli_materialize_and_audit(spark, tmp_path, capsys):
    from aws_datalake_platform_spark.__main__ import main

    idx = str(tmp_path / "idx")
    assert main(["materialize", "--sf-dir", SF, "--index", idx]) == 0
    out = capsys.readouterr().out
    for table in ("minhash_pairs", "simhash_pairs", "ngram_pairs", "dup_clusters"):
        assert f"{table}: version 1" in out

    assert main(["audit", "--sf-dir", SF, "--index", idx]) == 0
    out = capsys.readouterr().out
    for name in (
        "q214_dup_cluster_histogram",
        "q243_golden_record",
        "q277_detector_agreement",
        "q300_corpus_scorecard",
        "q349_cluster_agreement",
        "q354_dup_capture_recapture",
        "q367_cochran_q",
    ):
        assert f"## {name} (from index)" in out
