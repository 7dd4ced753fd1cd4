"""Stream-static enrichment, sliding windows, foreachBatch upsert sink:
each streaming path must agree with its batch twin on the static fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.events_queries import events_sliding
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.streaming.enrich import (
    customer_dim,
    run_enrich_to_memory,
    run_sliding_to_memory,
    run_upsert_sink,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sliding_matches_batch(spark):
    s = {
        tuple(r)
        for r in run_sliding_to_memory(spark, SF_DIR, "t_sliding").collect()
    }
    b = {
        tuple(r)
        for r in events_sliding(spark, SF_DIR)
        .select("win_start", "event_type", "n_events", "total_value")
        .collect()
    }
    assert s == b
    assert len(s) > 0


def test_stream_static_enrich_matches_batch_join(spark):
    got = run_enrich_to_memory(spark, SF_DIR, "t_enrich")
    ev = load_table(spark, SF_DIR, "events")
    want = ev.join(customer_dim(spark, SF_DIR), "user_id", "left").select(
        "event_id", "ts", "user_id", "mktsegment", "nationkey", "value"
    )
    assert got.count() == ev.count()  # left join: no row loss
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
    # every fixture user_id resolves against the dim → no null enrichment
    assert got.filter(F.col("mktsegment").isNull()).count() == 0


def test_foreach_batch_upsert_is_exactly_once_by_key(spark, tmp_path):
    target = str(tmp_path / "events_upserted")
    final = run_upsert_sink(spark, SF_DIR, target)
    ev = load_table(spark, SF_DIR, "events")
    assert final.count() == ev.count()  # doubled delivery collapsed
    assert final.select("event_id").distinct().count() == ev.count()
    # values survived the merge intact
    a = {(r.event_id, r.value) for r in final.select("event_id", "value").collect()}
    b = {(r.event_id, r.value) for r in ev.select("event_id", "value").collect()}
    assert a == b
