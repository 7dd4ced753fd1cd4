"""Custom stateful streaming operator via ``applyInPandasWithState``:
a per-user running profile (event count, value sum, last-seen timestamp)
maintained across micro-batches — the pattern for stateful logic that
windowed aggregates can't express (per-key custom state machines,
sessionization with side outputs, CEP-style rules).

Scale design: state lives in Spark's per-key state store, partitioned by
the grouping key across executors; each micro-batch touches only keys
with new events.  The Arrow-batched pandas hook processes a key's rows
vectorized.  A production deployment bounds state with a timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) evicting idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from star_schema_etl_airflow_spark.streaming.ingest import stream_events

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("last_seen", T.TimestampType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("last_seen_us", T.LongType()),
])


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        # Arrow may hand the ts column over as datetime64[us] or [ns]
        # depending on pandas/pyarrow version — normalize before the
        # epoch math instead of trusting Timestamp.value's unit.
        batch_max = pdf["ts"].astype("datetime64[ns]").max()
        last_us = max(last_us, int(batch_max.value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [total],
        # keep the column ns-resolution: pyspark's Arrow serializer for
        # applyInPandasWithState assumes datetime64[ns] input
        "last_seen": pd.Series([pd.Timestamp(last_us, unit="us")]).astype("datetime64[ns]"),
    })


def user_profile_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user running profile (update mode)."""
    ev = stream_events(spark, sf_dir).select("user_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_profiles_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "user_profiles"
) -> DataFrame:
    q = (
        user_profile_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)
