"""Incremental high-watermark ingestion and small-file compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.sources import io as sio
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.sources.incremental import (
    incremental_load,
    read_watermark,
    write_watermark,
)

SF_DIR = "/root/testdata/sf0.001"


def test_successive_loads_cover_source_disjointly(spark, tmp_path):
    store = str(tmp_path / "wm.json")
    ev = load_table(spark, SF_DIR, "events")
    # simulate two arrivals: first half by event_id, then everything
    first_arrival = ev.filter(F.col("event_id") < 500)

    s1, wm1 = incremental_load(first_arrival, "event_id", store, "events")
    assert s1.count() == first_arrival.count()  # first run: full slice
    write_watermark(store, "events", wm1)
    assert read_watermark(store, "events") == 499

    s2, wm2 = incremental_load(ev, "event_id", store, "events")
    assert {r.event_id for r in s2.select("event_id").collect()} == {
        r.event_id for r in ev.filter("event_id > 499").collect()
    }
    write_watermark(store, "events", wm2)

    # nothing new → empty slice, watermark holds
    s3, wm3 = incremental_load(ev, "event_id", store, "events")
    assert s3.count() == 0
    assert wm3 == wm2


def test_watermark_only_advances_after_commit(spark, tmp_path):
    store = str(tmp_path / "wm.json")
    ev = load_table(spark, SF_DIR, "events")
    _, wm = incremental_load(ev, "event_id", store, "events")
    # caller crashed before write_watermark → next run re-reads everything
    s, _ = incremental_load(ev, "event_id", store, "events")
    assert s.count() == ev.count()
    assert wm is not None


def test_compaction_reduces_file_count_preserving_rows(spark, tmp_path):
    out = str(tmp_path / "frag")
    df = spark.range(0, 20_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(out)  # simulate micro-batch fragmentation
    before = spark.read.parquet(out)
    rows_before = before.count()

    n_files = sio.compact_parquet(spark, out, target_file_bytes=10**9)
    assert n_files == 1
    after = spark.read.parquet(out)
    assert after.count() == rows_before
    assert after.exceptAll(df).count() == 0 and df.exceptAll(after).count() == 0


def test_ivm_empty_delta_is_noop(spark):
    """Merging an empty delta must not change the published summary."""
    from star_schema_etl_airflow_spark.operators.ivm import (
        grain_to_summary,
        merge_grain,
        sales_grain_partials,
    )
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    part = load_table(spark, sf, "part")
    state = sales_grain_partials(li, orders, part)
    empty = state.limit(0)
    before = sorted(map(tuple, grain_to_summary(state).collect()))
    after = sorted(map(tuple, grain_to_summary(merge_grain(state, empty)).collect()))
    assert before == after
