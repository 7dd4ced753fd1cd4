"""applyInPandasWithState: the final per-user state must equal the batch
groupBy over the same static fixture."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.streaming.stateful import run_profiles_to_memory

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_profiles_match_batch(spark):
    out = run_profiles_to_memory(spark, SF_DIR, name="t_user_profiles").toPandas()
    # update mode may emit a row per key per batch; the last emission per
    # user is the final state
    final = out.sort_values("n_events").groupby("user_id").tail(1).set_index("user_id")

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_seen"),
        )
        .toPandas()
        .set_index("user_id")
    )

    assert len(final) == len(batch)
    joined = final.join(batch, lsuffix="_s", rsuffix="_b")
    assert (joined["n_events_s"] == joined["n_events_b"]).all()
    assert (abs(joined["total_value_s"] - joined["total_value_b"]) < 1e-6).all()
    assert (
        pd.to_datetime(joined["last_seen_s"]) == pd.to_datetime(joined["last_seen_b"])
    ).all()
