"""Streaming snapshot sink: each micro-batch merges its aggregate delta
into a versioned snapshot table — a "streaming materialized view" with
time travel and a change feed, built on ``sources/snapshots.py``.

Why versions instead of appends: an aggregation stream re-emits CHANGED
groups, so a plain append sink accumulates conflicting rows.  Publishing
the merged state per batch gives (a) readers an always-consistent table
(the manifest swap is atomic), (b) history — ``read_snapshot(v)`` is the
state after batch v committed, (c) CDC — ``snapshot_change_feed(v-1, v)``
is exactly what that batch changed.

Exactly-once WITHOUT a transaction log: the micro-batch id is recorded
as manifest ``meta`` (the Delta ``txn`` appId/version pattern) and a
replayed batch whose id is already committed is skipped.  The crash
matrix:
- crash before the version directory completes → orphan files, no
  manifest entry → replay re-publishes cleanly;
- crash between data land and manifest rename → orphan DIRECTORY
  (invisible to readers, collected by vacuum) → replay re-publishes;
- crash after the manifest rename → replay sees its batch_id committed
  and skips → no double-count.

Scale notes: only result-sized state is rewritten per batch (merge of
the previous rollup with the batch delta — both rollup-sized); the
input is read once by the stream.  Aggregates must be MERGEABLE
(counts, sums, min/max — the same restriction as any incremental view);
value sums run in DECIMAL so the merged total is independent of batch
arrival order (the repo's cross-engine money rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.sources.snapshots import (
    read_snapshot,
    version_meta,
    write_snapshot,
)


def _merge_rollups(prev: DataFrame | None, delta: DataFrame) -> DataFrame:
    if prev is None:
        return delta
    return (
        prev.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").cast("decimal(18,6)").alias("total_value"),
        )
    )


def run_versioned_rollup(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Consume an events landing directory (one file per micro-batch);
    each batch merges its per-event-type count/value delta into the
    snapshot table as a new version.  Returns the final rollup."""
    from star_schema_etl_airflow_spark.streaming.ingest import (
        EVENTS_RAW_SCHEMA,
    )

    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        committed = {
            m.get("batch_id") for m in version_meta(table_dir).values()
        }
        if batch_id in committed:
            return  # replayed batch already published — exactly-once
        delta = batch_df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum("value").cast("decimal(18,6)").alias("total_value"),
        )
        try:
            prev = read_snapshot(spark, table_dir)
        except FileNotFoundError:
            prev = None
        merged = _merge_rollups(prev, delta)
        write_snapshot(merged, table_dir, meta={"batch_id": batch_id})

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_snapshot(spark, table_dir)
