"""transformWithStateInPandas (Spark 4 arbitrary-state API): the final
per-user state must equal the batch groupBy — the same contract as the
applyInPandasWithState twin (tests/test_stateful_streaming.py).

Skips where ``google.protobuf`` is unavailable: the API's state-server
control channel requires it and this sandbox cannot install packages
(see streaming/stateful2.py docstring)."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState control channel needs protobuf",
)

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.streaming.stateful2 import (
    run_tws_profiles_to_memory,
)

SF_DIR = "/root/testdata/sf0.001"


def test_tws_profiles_match_batch(spark):
    out = run_tws_profiles_to_memory(spark, SF_DIR, name="t_tws").toPandas()
    final = (
        out.sort_values("n_events").groupby("user_id").tail(1)
        .set_index("user_id")
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            (F.unix_micros(F.max("ts"))).alias("last_seen_us"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    joined = final.join(batch, lsuffix="_s", rsuffix="_b")
    assert (joined["n_events_s"] == joined["n_events_b"]).all()
    assert (
        abs(joined["total_value_s"] - joined["total_value_b"]) < 1e-6
    ).all()
    assert (joined["last_seen_us_s"] == joined["last_seen_us_b"]).all()
