"""Versioned snapshot tables: publish atomicity, time travel, rollback,
vacuum, and the version-to-version change feed."""

from __future__ import annotations

import json
import os

import pytest

from star_schema_etl_airflow_spark.sources.snapshots import (
    history,
    read_snapshot,
    rollback,
    snapshot_change_feed,
    vacuum,
    write_snapshot,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


@pytest.fixture()
def table(spark, tmp_path):
    d = str(tmp_path / "tbl")
    assert write_snapshot(_df(spark, [(1, "a"), (2, "b")]), d) == 1
    assert write_snapshot(_df(spark, [(1, "a2"), (3, "c")]), d) == 2
    assert write_snapshot(_df(spark, [(1, "a2"), (3, "c"), (4, "d")]), d) == 3
    return d


def test_latest_and_time_travel(spark, table):
    assert history(table) == [1, 2, 3]
    latest = {(r.id, r.val) for r in read_snapshot(spark, table).collect()}
    assert latest == {(1, "a2"), (3, "c"), (4, "d")}
    v1 = {(r.id, r.val) for r in read_snapshot(spark, table, 1).collect()}
    assert v1 == {(1, "a"), (2, "b")}


def test_uncommitted_partial_write_is_invisible(spark, table):
    """A version directory without a manifest entry (crashed write) must
    not be served — readers resolve strictly through the manifest."""
    os.makedirs(os.path.join(table, "v=9"))
    _df(spark, [(99, "torn")]).write.mode("overwrite").parquet(
        os.path.join(table, "v=9", "inner")
    )
    assert history(table) == [1, 2, 3]
    latest = {r.id for r in read_snapshot(spark, table).collect()}
    assert 99 not in latest
    # vacuum removes the orphan
    removed = vacuum(table, keep_last=3)
    assert removed == []
    assert not os.path.exists(os.path.join(table, "v=9"))


def test_rollback_then_rewrite(spark, table):
    rollback(table, 2)
    assert history(table) == [1, 2]
    assert {r.id for r in read_snapshot(spark, table).collect()} == {1, 3}
    # next write allocates a FRESH version number (no reuse of v=3's dir)
    v = write_snapshot(_df(spark, [(7, "x")]), table)
    assert v == 4
    assert {r.id for r in read_snapshot(spark, table).collect()} == {7}
    with pytest.raises(KeyError):
        read_snapshot(spark, table, 3)  # rolled back


def test_vacuum_keeps_readable_tail(spark, table):
    removed = vacuum(table, keep_last=2)
    assert removed == [1]
    assert history(table) == [2, 3]
    assert not os.path.exists(os.path.join(table, "v=1"))
    assert {r.id for r in read_snapshot(spark, table, 2).collect()} == {1, 3}
    with pytest.raises(KeyError):
        read_snapshot(spark, table, 1)


def test_manifest_publish_is_atomic_rename(spark, tmp_path):
    """No torn manifest: the publish path writes a temp sibling and
    renames; the manifest on disk is always valid JSON."""
    d = str(tmp_path / "tbl2")
    write_snapshot(_df(spark, [(1, "a")]), d)
    with open(os.path.join(d, "_manifest.json")) as f:
        m = json.load(f)
    assert m["versions"] == [{"version": 1, "path": "v=1"}]
    assert not os.path.exists(os.path.join(d, "_manifest.json.tmp"))


def test_change_feed_between_versions(spark, table):
    feed = {
        (r.id, r.change_type)
        for r in snapshot_change_feed(
            spark, table, 1, 2, keys=["id"]
        ).collect()
    }
    assert feed == {(1, "changed"), (2, "removed"), (3, "added")}
    # identity diff: everything unchanged
    same = snapshot_change_feed(spark, table, 2, 2, keys=["id"])
    assert {r.change_type for r in same.collect()} == {"unchanged"}
