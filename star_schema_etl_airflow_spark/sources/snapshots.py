"""Versioned snapshot tables: write-once version directories plus an
atomically-swapped JSON manifest — the minimal time-travel core of a
table format (Delta/Iceberg), built on raw parquet because those
libraries are environment-blocked here (SCALE.md) and because the
mechanism itself is worth owning: it is how every table format gets
time travel, rollback, and concurrent-reader safety.

Layout:

    table_dir/
      _manifest.json        {"versions": [{"version": 1, "path": "v=1"}, ...]}
      v=1/ ... parquet ...
      v=2/ ... parquet ...

Invariants:
- Version directories are IMMUTABLE once referenced by the manifest —
  a new write lands fully in ``v=N`` before the manifest mentions it,
  so readers never observe a half-written version (the manifest swap is
  a single POSIX/HDFS rename).
- Readers resolve the manifest once per read; a concurrent writer
  publishing ``v=N+1`` never disturbs a reader of ``v=N`` (no file in a
  referenced version is ever rewritten or deleted until ``vacuum``).
- Single-writer assumption, like raw Delta without a locking service:
  concurrent WRITERS need an external mutex (documented, not faked).

Scale notes: the manifest holds one small record per version (not per
file — Spark's own directory listing serves file discovery within a
version, and a version is one directory, so listing stays proportional
to the version actually read).  ``vacuum`` bounds history; rollback is
a manifest truncation, O(1) data movement.

Reference parity: beyond-reference (the reference overwrites BigQuery
tables in place; dated partition copies are its only history —
``sql/datamart/sales/sales_summary.sql:6-7``).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, MANIFEST)


def _load_manifest(table_dir: str) -> dict:
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return {"versions": []}
    with open(p) as f:
        return json.load(f)


def _store_manifest(table_dir: str, manifest: dict) -> None:
    """Atomic publish: write a temp sibling, fsync, rename over."""
    p = _manifest_path(table_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def history(table_dir: str) -> list[int]:
    """Committed versions, ascending."""
    return [v["version"] for v in _load_manifest(table_dir)["versions"]]


def write_snapshot(
    df: DataFrame, table_dir: str, meta: dict | None = None
) -> int:
    """Publish ``df`` as the next version; returns the version number.

    Data lands completely in the new version directory BEFORE the
    manifest references it — a crash mid-write leaves an orphan
    directory (cleaned by ``vacuum``), never a torn table.

    ``meta``: small JSON-able payload stored on the manifest entry —
    e.g. a streaming sink's ``batch_id`` (the Delta ``txn`` pattern),
    queried back via :func:`version_meta` to make replays idempotent."""
    os.makedirs(table_dir, exist_ok=True)
    manifest = _load_manifest(table_dir)
    # allocate past BOTH the manifest max and any version directory still
    # on disk — rolled-back and crashed-orphan dirs keep their numbers
    # until vacuum, and immutability forbids reusing them
    on_disk = (
        int(e[2:]) for e in os.listdir(table_dir)
        if e.startswith("v=") and e[2:].isdigit()
    )
    committed = (v["version"] for v in manifest["versions"])
    version = max([*on_disk, *committed], default=0) + 1
    rel = f"v={version}"
    df.write.mode("errorifexists").parquet(os.path.join(table_dir, rel))
    entry = {"version": version, "path": rel}
    if meta:
        entry["meta"] = meta
    manifest["versions"].append(entry)
    _store_manifest(table_dir, manifest)
    return version


def version_meta(table_dir: str) -> dict[int, dict]:
    """Committed version → its ``meta`` payload (empty dict if none)."""
    return {
        v["version"]: v.get("meta", {})
        for v in _load_manifest(table_dir)["versions"]
    }


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Latest committed version, or time-travel to ``version``."""
    manifest = _load_manifest(table_dir)
    if not manifest["versions"]:
        raise FileNotFoundError(f"no committed versions in {table_dir!r}")
    by_v = {v["version"]: v for v in manifest["versions"]}
    if version is None:
        version = max(by_v)
    if version not in by_v:
        raise KeyError(
            f"version {version} not in {sorted(by_v)} "
            f"(rolled back or vacuumed?)"
        )
    return spark.read.parquet(os.path.join(table_dir, by_v[version]["path"]))


def rollback(table_dir: str, version: int) -> None:
    """Drop manifest entries AFTER ``version`` (data dirs stay until
    ``vacuum`` — re-publishing is a manifest edit, O(1) data)."""
    manifest = _load_manifest(table_dir)
    kept = [v for v in manifest["versions"] if v["version"] <= version]
    if not kept or kept[-1]["version"] != version:
        raise KeyError(f"version {version} not committed in {table_dir!r}")
    _store_manifest(table_dir, {"versions": kept})


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete data of all but the newest ``keep_last`` committed versions
    (plus any orphan directories a crashed write left); returns removed
    versions.  Readers of retained versions are untouched."""
    manifest = _load_manifest(table_dir)
    keep = manifest["versions"][-keep_last:] if keep_last > 0 else []
    keep_rel = {v["path"] for v in keep}
    removed = [
        v["version"] for v in manifest["versions"] if v["path"] not in keep_rel
    ]
    _store_manifest(table_dir, {"versions": keep})
    for entry in os.listdir(table_dir):
        if entry.startswith("v=") and entry not in keep_rel:
            shutil.rmtree(os.path.join(table_dir, entry), ignore_errors=True)
    return removed


def snapshot_change_feed(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int,
    keys: list[str],
    tracked: list[str] | None = None,
) -> DataFrame:
    """CDC between two committed versions: composes time travel with
    ``operators.diff.snapshot_diff`` (full-outer key join, null-safe
    change classification)."""
    from star_schema_etl_airflow_spark.operators.diff import snapshot_diff

    return snapshot_diff(
        read_snapshot(spark, table_dir, from_version),
        read_snapshot(spark, table_dir, to_version),
        keys,
        tracked,
    )
