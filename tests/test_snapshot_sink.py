"""Streaming snapshot sink: per-batch versions, batch-twin equivalence,
replay idempotency (the manifest batch_id txn pattern), and the
version-to-version change feed over the stream's history."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.sources.snapshots import (
    history,
    read_snapshot,
    snapshot_change_feed,
    version_meta,
)
from star_schema_etl_airflow_spark.streaming.snapshot_sink import (
    run_versioned_rollup,
)

EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

BATCHES = [
    [(1, 10, 1, "click", 1.5, "{}"), (2, 11, 1, "view", 2.0, "{}")],
    [(3, 12, 2, "click", 0.5, "{}"), (4, 13, 2, "click", 1.0, "{}")],
    [(5, 14, 3, "buy", 9.25, "{}")],
]


def _stage(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, rows in enumerate(BATCHES):
        staging = str(tmp_path / f"stage_{i}")
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = next(
            f for f in os.listdir(staging)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.rename(
            os.path.join(staging, part),
            os.path.join(landing, f"batch_{i}.parquet"),
        )
    return landing


def test_versioned_rollup_batch_twin_and_history(spark, tmp_path):
    landing = _stage(spark, tmp_path)
    table = str(tmp_path / "rollup")
    final = run_versioned_rollup(
        spark, landing, table, str(tmp_path / "ckpt")
    )
    got = {
        (r.event_type, r.n_events, str(r.total_value))
        for r in final.collect()
    }
    # batch twin: one aggregation over the concatenation
    all_rows = [r for b in BATCHES for r in b]
    twin = (
        spark.createDataFrame(all_rows, EV_SCHEMA)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").cast("decimal(18,6)").alias("total_value"),
        )
    )
    assert got == {
        (r.event_type, r.n_events, str(r.total_value))
        for r in twin.collect()
    }
    # one committed version per non-empty batch, each tagged with its id
    assert history(table) == [1, 2, 3]
    metas = version_meta(table)
    assert sorted(m["batch_id"] for m in metas.values()) == [0, 1, 2]
    # time travel: version 1 is batch 0 alone
    v1 = {
        (r.event_type, r.n_events)
        for r in read_snapshot(spark, table, 1).collect()
    }
    assert v1 == {("click", 1), ("view", 1)}


def test_replayed_batch_is_skipped(spark, tmp_path):
    """Replay the whole stream with a FRESH checkpoint (worst-case
    redelivery of every batch): committed batch_ids must be skipped and
    the table must not double-count."""
    landing = _stage(spark, tmp_path)
    table = str(tmp_path / "rollup")
    run_versioned_rollup(spark, landing, table, str(tmp_path / "ckpt1"))
    before = history(table)
    final = run_versioned_rollup(
        spark, landing, table, str(tmp_path / "ckpt2")
    )
    assert history(table) == before  # no new versions published
    clicks = next(r for r in final.collect() if r.event_type == "click")
    assert clicks.n_events == 3  # not 6


def test_change_feed_over_stream_history(spark, tmp_path):
    landing = _stage(spark, tmp_path)
    table = str(tmp_path / "rollup")
    run_versioned_rollup(spark, landing, table, str(tmp_path / "ckpt"))
    feed = {
        (r.event_type, r.change_type)
        for r in snapshot_change_feed(
            spark, table, 1, 2, keys=["event_type"]
        ).collect()
    }
    # batch 1 added two clicks: click changed, view untouched, buy absent
    assert feed == {("click", "changed"), ("view", "unchanged")}
    feed23 = {
        (r.event_type, r.change_type)
        for r in snapshot_change_feed(
            spark, table, 2, 3, keys=["event_type"]
        ).collect()
    }
    assert feed23 == {
        ("click", "unchanged"), ("view", "unchanged"), ("buy", "added")
    }
