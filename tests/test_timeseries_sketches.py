"""Invariant tests for the time-series and sketch operators (their value
parity vs DuckDB is covered by the registry oracles; these pin the
algorithmic claims the oracles can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.sketches import (
    cms_heavy_hitters,
    revenue_percentiles,
)
from star_schema_etl_airflow_spark.plans.timeseries import (
    WINDOW_SECONDS,
    events_range_join,
    hypertable_rollup,
)
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_range_join_binning_matches_naive_plan(spark):
    """The bucketed band join must be a pure optimization: identical
    result to the unbinned equi-join + range filter."""
    ev = load_table(spark, SF_DIR, "events")
    probe = ev.filter(F.col("event_type") == "purchase").alias("a")
    build = ev.alias("b")
    naive = (
        probe.join(
            build,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("a.ts") - F.expr(f"INTERVAL {WINDOW_SECONDS} SECOND"))
            & (F.col("b.ts") < F.col("a.ts")),
            "left",
        )
        .groupBy("a.event_id")
        .agg(
            F.count("b.ts").alias("n_prior_events"),
            F.countDistinct("b.event_type").alias("n_prior_types"),
            F.coalesce(
                F.sum(F.col("b.value").cast("decimal(28,10)")), F.lit(0)
            ).cast("double").alias("prior_value"),
        )
    )
    binned = events_range_join(spark, SF_DIR)
    assert {tuple(r) for r in binned.collect()} == {tuple(r) for r in naive.collect()}


def test_range_join_covers_all_probes(spark):
    ev = load_table(spark, SF_DIR, "events")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert events_range_join(spark, SF_DIR).count() == n_purchases


def test_hypertable_rollup_reaggregation_is_lossless(spark):
    """Day stats derived from hour partials == day stats from raw events
    (including the distinct-user merge from per-hour partial sets)."""
    ev = load_table(spark, SF_DIR, "events")
    direct = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.countDistinct(F.date_trunc("hour", "ts")).alias("n_hours"),
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    rolled = hypertable_rollup(spark, SF_DIR).select(
        "day", "event_type", "n_hours", "n_events", "n_users"
    )
    assert {tuple(r) for r in rolled.collect()} == {tuple(r) for r in direct.collect()}


def test_cms_estimate_is_one_sided(spark):
    """Count-min error is one-sided: estimate >= exact count, always."""
    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r["cms_estimate"] >= r["exact_count"] for r in rows)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_percentiles_are_ordered(spark):
    for r in revenue_percentiles(spark, SF_DIR).collect():
        assert r["p50"] <= r["p90"] <= r["p99"]


def test_streaming_dedup_within_watermark(spark):
    """Every event delivered twice → streaming dedup returns each exactly
    once (agrees with the batch twin on count and key set)."""
    from star_schema_etl_airflow_spark.streaming.ingest import run_dedup_to_memory

    ev = load_table(spark, SF_DIR, "events")
    result = run_dedup_to_memory(spark, SF_DIR, name="t_stream_dedup")
    assert result.count() == ev.count()
    got = {r["event_id"] for r in result.select("event_id").collect()}
    want = {r["event_id"] for r in ev.select("event_id").collect()}
    assert got == want
