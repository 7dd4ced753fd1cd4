"""Structured Streaming ingest: the watermarked tumbling rollup must
agree with its batch twin (events_tumbling) on the static fixture."""

from __future__ import annotations

from star_schema_etl_airflow_spark.plans.events_queries import events_tumbling
from star_schema_etl_airflow_spark.streaming.ingest import run_to_memory

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_rollup_matches_batch(spark):
    stream_result = run_to_memory(spark, SF_DIR, name="t_stream_rollup")
    batch = (
        events_tumbling(spark, SF_DIR)
        .select("hour", "event_type", "n_events", "total_value")
    )

    s = {tuple(r) for r in stream_result.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert len(s) > 0


def test_streaming_sessionize_matches_batch(spark):
    from star_schema_etl_airflow_spark.plans.events_queries import (
        events_sessionize,
    )
    from star_schema_etl_airflow_spark.streaming.ingest import (
        run_sessionize_to_memory,
    )

    stream_result = run_sessionize_to_memory(spark, SF_DIR, name="t_sessions")
    batch = events_sessionize(spark, SF_DIR).select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )
    s = sorted(tuple(r) for r in stream_result.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert s == b
    assert len(s) > 0


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """Pin watermark semantics: an event arriving after the watermark has
    passed its window is DROPPED, and only windows the watermark has
    closed are emitted in append mode."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.streaming.ingest import (
        EVENTS_RAW_SCHEMA,
        tumbling_agg,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    H = 3_600_000_000_000  # one hour in nanos

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            [(i, ts, 1, "view", 1.0, "{}") for i, ts in enumerate(rows)],
            EVENTS_RAW_SCHEMA,
        )
        staging = str(tmp_path / ("st_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        dst = os.path.join(landing, name)
        os.rename(os.path.join(staging, part), dst)
        os.utime(dst, (mtime, mtime))

    import time as _t
    now = _t.time()
    # batch 0: events in hours 1, 2, 10 → watermark advances to hour 8
    write_file("b1.parquet", [1 * H, 2 * H, 10 * H], now - 100)
    # batch 1: hour 11 — lets eviction run (state cleanup lags the
    # watermark by one batch; a late row arriving in the SAME batch the
    # window is evicted still merges, by design)
    write_file("b2.parquet", [11 * H], now - 99)
    # batch 2: LATE event back in hour 1, far behind the watermark ⇒ DROPPED
    write_file("b3.parquet", [1 * H + 1000], now - 98)

    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    q = (
        tumbling_agg(stream)
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress for op in p["stateOperators"]
    )
    assert dropped == 1
    rows = sorted(
        (r.hour.hour, r.n_events) for r in spark.table("t_late").collect()
    )
    # only hours 1 and 2 are finalized (final watermark = hour 9), each
    # emitted exactly once, and the late arrival never re-created state
    assert rows == [(1, 1), (2, 1)], rows
