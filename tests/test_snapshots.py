"""Snapshot store: versioned writes, time travel, rollback, expiry
(operators/snapshots.py — the table-level analogue of the reference's
S3 bucket versioning, terraform/modules/s3/main.tf:28-33)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_datalake_platform_spark.operators.snapshots import (
    diff_snapshots,
    expire_snapshots,
    list_snapshots,
    read_snapshot,
    rollback,
    write_snapshot,
)


@pytest.fixture()
def store(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string")
    df3 = spark.createDataFrame([(4, "d")], "id long, v string")
    assert write_snapshot(df1, path) == 1
    assert write_snapshot(df2, path, mode="overwrite") == 2
    assert write_snapshot(df3, path, mode="append") == 3
    return path


def test_time_travel_reads_every_version(spark, store):
    assert sorted(r.id for r in read_snapshot(spark, store, 1).collect()) == [1, 2]
    assert sorted(r.id for r in read_snapshot(spark, store, 2).collect()) == [1, 3]
    # append = parent rows + new rows, old dirs referenced not copied
    assert sorted(r.id for r in read_snapshot(spark, store).collect()) == [1, 3, 4]


def test_manifest_history_and_counts(spark, store):
    snaps = list_snapshots(store)
    assert [s["version"] for s in snaps] == [1, 2, 3]
    assert [s["n_rows"] for s in snaps] == [2, 2, 3]
    assert snaps[2]["op"] == "append"
    assert snaps[2]["parent"] == 2
    # append reuses the parent's data dir by reference
    assert snaps[1]["data_dirs"][0] in snaps[2]["data_dirs"]


def test_rollback_repoints_without_copy(spark, store):
    v = rollback(store, 1)
    assert v == 4
    assert sorted(r.id for r in read_snapshot(spark, store).collect()) == [1, 2]
    snaps = list_snapshots(store)
    assert snaps[-1]["op"] == "rollback:1"
    assert snaps[-1]["data_dirs"] == snaps[0]["data_dirs"]  # re-pointed


def test_expire_preserves_referenced_dirs(spark, store):
    rollback(store, 1)  # v4 references v1's dir
    report = expire_snapshots(store, keep_last=2, dry_run=True)
    assert report["expired_versions"] == [1, 2]
    # every dropped version's dir is still referenced by a survivor
    # (v3 appended onto v2's dir; v4 re-points at v1's) — delete nothing
    assert report["deleted_dirs"] == []
    assert {"data/00001", "data/00002"} <= set(report["kept_dirs"])
    # dry run touched nothing
    assert len(list_snapshots(store)) == 4
    report = expire_snapshots(store, keep_last=1)  # only v4 (rollback->v1)
    assert [s["version"] for s in list_snapshots(store)] == [4]
    assert report["deleted_dirs"] == ["data/00002", "data/00003"]
    assert not os.path.exists(os.path.join(store, "data/00002"))
    # the survivor still reads correctly through its re-pointed dir
    assert sorted(r.id for r in read_snapshot(spark, store, 4).collect()) == [1, 2]
    assert os.path.exists(os.path.join(store, "data/00001"))


def test_diff_snapshots_cdc(spark, store):
    diff = diff_snapshots(spark, store, 1, 2, keys=["id"], compare_cols=["v"])
    rows = {r.id: r.change_type for r in diff.collect()}
    assert rows == {1: "UPDATE", 2: "DELETE", 3: "INSERT"}


def test_unknown_version_and_empty_store_raise(spark, tmp_path, store):
    with pytest.raises(KeyError):
        read_snapshot(spark, store, 99)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "nope"))


def test_failed_write_does_not_wedge_the_store(spark, tmp_path):
    """Regression (r3 review): an orphan data dir from a crashed write
    (created, never committed) must not block every future write."""
    import os

    path = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame([(1,)], "id long"), path)
    # simulate a crash between parquet write and manifest commit
    orphan = os.path.join(path, "data", "00002")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-junk.parquet"), "w").write("junk")
    v = write_snapshot(spark.createDataFrame([(2,)], "id long"), path)
    assert v == 2
    assert sorted(r.id for r in read_snapshot(spark, path).collect()) == [2]
    # a write that raises mid-flight cleans its own dir
    import pytest as _pytest

    bad = spark.createDataFrame([(3,)], "id long").select(
        (F.col("id") / F.lit(0)).alias("boom")  # ANSI division error at write
    )
    with _pytest.raises(Exception):
        write_snapshot(bad, path)
    assert not os.path.exists(os.path.join(path, "data", "00003"))
    assert write_snapshot(spark.createDataFrame([(4,)], "id long"), path) == 3


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.tuples(st.sampled_from(["overwrite", "append", "rollback"]),
              st.lists(st.integers(0, 99), min_size=1, max_size=4, unique=True)),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_ops)
def test_snapshot_history_model(spark, tmp_path_factory, ops):
    """Model-based check: after ANY sequence of overwrite/append/rollback,
    every version reads back exactly the model's tracked row set."""
    path = str(tmp_path_factory.mktemp("snap") / "tbl")
    model: dict[int, list[int]] = {}
    current: list[int] = []
    for op, ids in ops:
        if op == "rollback" and model:
            target = sorted(model)[len(model) // 2]
            v = rollback(path, target)
            current = list(model[target])
        else:
            df = spark.createDataFrame([(i,) for i in ids], "id long")
            if op == "append" and model:
                v = write_snapshot(df, path, mode="append")
                current = current + ids
            else:
                v = write_snapshot(df, path, mode="overwrite")
                current = list(ids)
        model[v] = list(current)
    for v, expect in model.items():
        got = sorted(r.id for r in read_snapshot(spark, path, v).collect())
        assert got == sorted(expect), (v, got, expect)
    assert [s["version"] for s in list_snapshots(path)] == sorted(model)
