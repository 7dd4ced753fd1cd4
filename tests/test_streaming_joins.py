"""Stream-stream interval join must agree with its batch twin."""

from __future__ import annotations

from star_schema_etl_airflow_spark.streaming.joins import (
    batch_attribution,
    run_attribution_to_memory,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_stream_attribution_matches_batch(spark):
    s = {
        tuple(r)
        for r in run_attribution_to_memory(spark, SF_DIR, "t_attr").collect()
    }
    b = {tuple(r) for r in batch_attribution(spark, SF_DIR).collect()}
    assert s == b
    assert len(s) > 0
