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
