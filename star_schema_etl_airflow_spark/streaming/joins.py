"""Stream-stream interval join: purchase events joined to the same user's
view events within the preceding hour — attribution, the canonical
two-stream pattern.

Both sides are unbounded streams, so Spark buffers each side in state;
correctness AND boundedness come from the pair (watermark, time-range
join condition): the range condition tells Spark how long a buffered row
can still match (1 hour), the watermark bounds late data (2 hours), so
state per side is ≈ (interval + watermark) × arrival rate — independent
of total stream length.  An inner interval join without the range
condition would buffer FOREVER; Spark rejects missing watermarks on
stream-stream joins for exactly this reason.

At 100 TB/day the join key (user_id) spreads state across executors;
RocksDB state store + state TTL are the production knobs.  The batch twin
(same predicate over the static fixture) is the differential oracle —
tests/test_streaming_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.streaming.ingest import stream_events

JOIN_INTERVAL = "1 hour"
JOIN_WATERMARK = "2 hours"


def _views(ev: DataFrame) -> DataFrame:
    return (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", JOIN_WATERMARK)
    )


def _purchases(ev: DataFrame) -> DataFrame:
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", JOIN_WATERMARK)
    )


def _attribution_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    return purchases.join(
        views,
        F.expr(
            "v_user = p_user AND view_ts <= purchase_ts "
            f"AND view_ts > purchase_ts - INTERVAL {JOIN_INTERVAL}"
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "purchase_value",
    )


def streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream variant: two independent file-source streams."""
    return _attribution_join(
        _views(stream_events(spark, sf_dir)),
        _purchases(stream_events(spark, sf_dir)),
    )


def batch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin over the static fixture (the oracle for the stream)."""
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return _attribution_join(views, purchases)


def run_attribution_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "stream_attr"
) -> DataFrame:
    q = (
        streaming_attribution(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)
