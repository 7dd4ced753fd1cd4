"""Custom stateful streaming via ``transformWithStateInPandas`` — the
Spark 4 arbitrary-state API (StatefulProcessor lifecycle + typed state
handles) that succeeds ``applyInPandasWithState``.

Same semantics as ``streaming/stateful.py`` (per-user running profile:
event count, value sum, last-seen timestamp) so the two APIs are
directly comparable; the batch-diff test pins both to the same batch
aggregate.  What the new API adds over the old one:

- named, typed state primitives (ValueState / ListState / MapState)
  instead of one packed tuple — state evolves per-field;
- an explicit processor lifecycle (``init`` / ``handleInputRows`` /
  ``close``) and timer callbacks (``handleExpiredTimer``) for TTL-style
  eviction without sentinel rows;
- requires the RocksDB state store provider (changelog-checkpointed at
  scale) — the session conf is set by the runner below.

Environment note: the API's state-server control channel needs
``google.protobuf``, which this sandbox does not ship (and installs are
disallowed), so ``tests/test_stateful_tws.py`` skips cleanly where the
import fails — the same guarded pattern as the Delta MERGE backend.
``applyInPandasWithState`` (``streaming/stateful.py``) is the
environment-proven stateful path with identical semantics.

Scale notes are identical to the old operator: state is partitioned by
the grouping key across executors, each micro-batch touches only keys
with new rows, and Arrow batches keep the Python hook vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from star_schema_etl_airflow_spark.streaming.ingest import stream_events

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("last_seen_us", T.LongType()),
])

PROFILE_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("last_seen_us", T.LongType()),
])


class UserProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState(
            "profile", PROFILE_STATE_SCHEMA
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._profile.exists():
            n, total, last_us = self._profile.get()
        else:
            n, total, last_us = 0, 0.0, 0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].astype("datetime64[ns]").max()
            last_us = max(last_us, int(batch_max.value // 1000))
        self._profile.update((n, total, last_us))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_seen_us": [last_us],
        })

    def close(self) -> None:
        pass


_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@contextmanager
def rocksdb_state_store(spark: SparkSession):
    """Scope the RocksDB state-store provider to one query run.

    transformWithStateInPandas requires RocksDB, but the provider conf is
    session-wide — setting it permanently would silently switch EVERY
    later streaming query in a shared session.  Save the prior value and
    restore (or unset) it on exit."""
    try:
        prior = spark.conf.get(_PROVIDER_KEY)
    except Exception:
        prior = None
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prior)


def user_profile_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user running profile through the new API.

    The returned plan is lazy: the RocksDB provider conf must be in
    effect when the query STARTS — use :func:`rocksdb_state_store`
    around ``start()``/``awaitTermination`` (the runner below does)."""
    ev = stream_events(spark, sf_dir).select("user_id", "ts", "value")
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_tws_profiles_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "tws_profiles"
) -> DataFrame:
    with rocksdb_state_store(spark):
        q = (
            user_profile_tws(spark, sf_dir)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    return spark.table(name)
