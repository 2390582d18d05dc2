"""Snapshot store: versioned table writes with time-travel reads,
rollback, and snapshot expiry.

The reference keeps every object version of its lake bucket
(`aws_s3_bucket_versioning`, reference terraform/modules/s3/main.tf:28-33)
— object-level time travel with no table semantics. This module provides
the TABLE-level equivalent an engine needs: each write is an immutable
snapshot described by a manifest, reads pin a version (default latest),
rollback re-points (never copies or deletes data), and expiry reclaims
only data no retained snapshot references — the Delta/Iceberg snapshot
mechanic re-expressed over plain parquet + a JSON manifest, with Spark
doing all row work.

Layout:

    table_path/
      _manifest.json          # {"versions": [{version, data_dirs, n_rows,
                              #   op, parent}, ...]} — newest last
      data/00001/part-*.parquet
      data/00002/...

Design rules:
- data dirs are IMMUTABLE once a snapshot commits; "overwrite" writes a
  new dir, "append" writes a new dir and references the parent's dirs
  too, so old versions stay readable until expired.
- the manifest is tiny driver-side METADATA (never row data); the only
  row-touching operations are `df.write.parquet` and `spark.read`.
- single-writer: the manifest write is a write-temp-then-rename, which
  is atomic on POSIX; multi-writer coordination (conditional put /
  catalog lock) is the storage layer's job, as it is for Delta on S3.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, _MANIFEST)


def _load_manifest(table_path: str) -> dict[str, Any]:
    path = _manifest_path(table_path)
    if not os.path.exists(path):
        return {"versions": []}
    with open(path) as fh:
        return json.load(fh)


def _store_manifest(table_path: str, manifest: dict[str, Any]) -> None:
    tmp = _manifest_path(table_path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, _manifest_path(table_path))  # atomic commit point


def _resolve(manifest: dict[str, Any], version: int | None) -> dict[str, Any]:
    versions = manifest["versions"]
    if not versions:
        raise FileNotFoundError("snapshot store is empty")
    if version is None:
        return versions[-1]
    for v in versions:
        if v["version"] == version:
            return v
    known = [v["version"] for v in versions]
    raise KeyError(f"unknown snapshot version {version}; known: {known}")


def write_snapshot(df: DataFrame, table_path: str, mode: str = "overwrite") -> int:
    """Commit ``df`` as a new snapshot; returns the new version number.

    mode="overwrite": the snapshot is exactly ``df``.
    mode="append": the snapshot is the parent snapshot plus ``df``
    (new data dir + the parent's dirs by reference — no rewrite).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    manifest = _load_manifest(table_path)
    versions = manifest["versions"]
    new_version = (versions[-1]["version"] + 1) if versions else 1
    data_dir = os.path.join("data", f"{new_version:05d}")
    full_dir = os.path.join(table_path, data_dir)
    # crash recovery: a write that failed AFTER creating the dir but
    # BEFORE the manifest commit leaves an orphan that would wedge every
    # retry with PATH_ALREADY_EXISTS (r3 review finding). The new
    # version's dir can never be referenced by any committed manifest
    # entry (versions only grow; rollback re-points at OLD dirs), so an
    # existing dir here is provably uncommitted garbage — reclaim it.
    if os.path.exists(full_dir):
        shutil.rmtree(full_dir)
    try:
        df.write.mode("errorifexists").parquet(full_dir)
    except Exception:
        shutil.rmtree(full_dir, ignore_errors=True)
        raise
    n_new = df.sparkSession.read.parquet(os.path.join(table_path, data_dir)).count()
    if mode == "append" and versions:
        parent = versions[-1]
        data_dirs = list(parent["data_dirs"]) + [data_dir]
        n_rows = parent["n_rows"] + n_new
    else:
        data_dirs = [data_dir]
        n_rows = n_new
    versions.append(
        {
            "version": new_version,
            "data_dirs": data_dirs,
            "n_rows": n_rows,
            "op": mode,
            "parent": versions[-1]["version"] if versions else None,
        }
    )
    _store_manifest(table_path, manifest)
    return new_version


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the table as of ``version`` (default: latest)."""
    snap = _resolve(_load_manifest(table_path), version)
    paths = [os.path.join(table_path, d) for d in snap["data_dirs"]]
    return spark.read.parquet(*paths)


def list_snapshots(table_path: str) -> list[dict[str, Any]]:
    """Manifest entries, oldest first — the audit/history surface."""
    return list(_load_manifest(table_path)["versions"])


def rollback(table_path: str, version: int) -> int:
    """Restore the table to ``version`` by committing a NEW snapshot that
    re-points at the old snapshot's data dirs. History is preserved (the
    bad versions stay readable until expired) and no data is copied —
    the Delta RESTORE semantic."""
    manifest = _load_manifest(table_path)
    target = _resolve(manifest, version)
    versions = manifest["versions"]
    new_version = versions[-1]["version"] + 1
    versions.append(
        {
            "version": new_version,
            "data_dirs": list(target["data_dirs"]),
            "n_rows": target["n_rows"],
            "op": f"rollback:{version}",
            "parent": versions[-1]["version"],
        }
    )
    _store_manifest(table_path, manifest)
    return new_version


def expire_snapshots(table_path: str, keep_last: int, dry_run: bool = False) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and delete data
    dirs no retained snapshot references (re-pointed dirs survive).

    Returns {"expired_versions": [...], "deleted_dirs": [...],
    "kept_dirs": [...]}; with dry_run=True the manifest and files are
    untouched — the same contract as expire_partitions (maintenance.py).
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    manifest = _load_manifest(table_path)
    versions = manifest["versions"]
    keep = versions[-keep_last:]
    drop = versions[:-keep_last]
    kept_dirs = {d for v in keep for d in v["data_dirs"]}
    dropped_dirs = sorted(
        {d for v in drop for d in v["data_dirs"]} - kept_dirs
    )
    report = {
        "expired_versions": [v["version"] for v in drop],
        "deleted_dirs": dropped_dirs,
        "kept_dirs": sorted(kept_dirs),
    }
    if dry_run:
        return report
    for d in dropped_dirs:
        shutil.rmtree(os.path.join(table_path, d), ignore_errors=True)
    manifest["versions"] = keep
    _store_manifest(table_path, manifest)
    return report


def diff_snapshots(
    spark: SparkSession,
    table_path: str,
    version_a: int,
    version_b: int,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level INSERT/DELETE/UPDATE between two snapshots — the q73
    CDC diff (operators/quality.py:snapshot_diff) applied to the
    version store."""
    from .quality import snapshot_diff

    old = read_snapshot(spark, table_path, version_a)
    new = read_snapshot(spark, table_path, version_b)
    return snapshot_diff(old, new, keys=keys, compare_cols=compare_cols)
