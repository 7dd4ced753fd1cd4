"""Structured Streaming ingest over the ``events`` fixture.

The reference is strictly daily batch (SURVEY.md §2.9); this is the
planned Spark-native extension: a file-source stream with an event-time
watermark feeding the same tumbling aggregation as the batch
``events_tumbling`` query — the batch query is the differential oracle
for this streaming path (tests/test_streaming.py asserts they agree).

Scale design: the file source at 100 TB becomes Kafka/Kinesis with the
same plan; the watermark bounds state (late events beyond 2 hours are
dropped), and the windowed aggregate's state store is keyed by
(window, event_type) — small, bounded cardinality.  ``maxFilesPerTrigger``
is the ingestion rate knob for file sources.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.sources.fixtures import table_path

WATERMARK = "2 hours"
WINDOW = "1 hour"

# Parquet-on-disk schema with ``spark.sql.legacy.parquet.nanosAsLong``:
# the TIMESTAMP(NANOS) column arrives as nanos-since-epoch int64.
EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


# Epoch values this large (> ~year 1973 in nanos, > year 5138 in micros)
# can only be nanoseconds — used to normalize the long column no matter
# which unit the reader surfaced it in (the batch reader under
# ``nanosAsLong`` yields nanos; the streaming reader with an explicit
# LongType schema has been observed to yield micros).
_NS_THRESHOLD = 10**17

_TS_FROM_LONG = (
    f"timestamp_micros(CASE WHEN ts > {_NS_THRESHOLD} THEN ts div 1000 "
    "ELSE ts END)"
)


def ts_from_long(df: DataFrame, unit: str | None = None) -> DataFrame:
    """Normalize a long epoch ``ts`` column (nanos or micros) to a proper
    microsecond TimestampType column.

    ``unit``: pass ``"nanos"`` or ``"micros"`` when the source unit is
    known (a reader that declares its encoding should thread it through —
    no inference).  With ``unit=None`` the magnitude heuristic applies,
    which is only sound for timestamps in [1973-04-11, 5138-11-16]: a
    nano epoch below 1e17 (before ~1973) would be misread as micros, and
    a micro epoch above 1e17 (after year ~5138) as nanos.  The fixture
    and any modern event stream sit comfortably inside that window."""
    if unit == "nanos":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if unit == "micros":
        return df.withColumn("ts", F.expr("timestamp_micros(ts)"))
    if unit is not None:
        raise ValueError(f"unit must be 'nanos', 'micros', or None: {unit!r}")
    return df.withColumn("ts", F.expr(_TS_FROM_LONG))


def _as_stream_dir(sf_dir: str) -> str:
    """Spark's file stream source requires a *directory*; the fixture is a
    single parquet file.  Stage a stable symlink directory under /tmp
    (re-created idempotently) — in production this is simply the landing
    directory new files arrive in."""
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_{abs(hash(sf_dir)) % 10**8}"
    )
    os.makedirs(base, exist_ok=True)
    link = os.path.join(base, "events.parquet")
    if not os.path.exists(link):
        os.symlink(table_path(sf_dir, "events"), link)
    return base


def stream_events(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of the events table with a proper timestamp."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(_as_stream_dir(sf_dir))
    return ts_from_long(df)


def tumbling_agg(ev: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """The watermarked tumbling rollup over any event stream."""
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", WINDOW), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window rollup — the streaming twin of the
    batch ``events_tumbling`` query (same grouping, same aggregates; the
    batch form is the oracle)."""
    return tumbling_agg(stream_events(spark, sf_dir))


def _as_dup_stream_dir(sf_dir: str) -> str:
    """A landing directory where the same batch arrived TWICE (two files
    with identical rows) — the at-least-once-delivery shape streaming
    dedup exists for."""
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_dupstream_{abs(hash(sf_dir)) % 10**8}"
    )
    os.makedirs(base, exist_ok=True)
    for fname in ("events_a.parquet", "events_b.parquet"):
        link = os.path.join(base, fname)
        if not os.path.exists(link):
            os.symlink(table_path(sf_dir, "events"), link)
    return base


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on the event key with watermark-bounded state
    (``dropDuplicatesWithinWatermark``): duplicates arriving within the
    watermark horizon are dropped, and key state older than the watermark
    is evicted — the unbounded-state ``dropDuplicates`` alternative is a
    memory leak at 100 TB/day ingest rates.

    Reads a landing dir where every event was delivered twice; the batch
    twin (``SELECT DISTINCT``-by-key over one copy) is the oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(_as_dup_stream_dir(sf_dir))
    return (
        ts_from_long(df)
        .withWatermark("ts", WATERMARK)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def run_dedup_to_memory(spark: SparkSession, sf_dir: str,
                        name: str = "stream_dedup") -> DataFrame:
    """Run the streaming dedup over the doubled landing dir to completion
    (one availableNow batch — both copies arrive inside the watermark, so
    the dedup is total) and return the result as a batch DataFrame."""
    q = (
        streaming_dedup(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def run_to_memory(spark: SparkSession, sf_dir: str, name: str = "stream_rollup") -> DataFrame:
    """Execute the streaming rollup to completion against the (static)
    fixture directory via a memory sink; returns the result as a batch
    DataFrame.  Complete mode: every trigger emits full state, which the
    test compares against the batch twin."""
    q = (
        streaming_tumbling(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming sessionization — ``session_window`` merges
    per-user event runs with a 30-minute gap, the streaming twin of the
    batch ``events_sessionize`` query (the oracle).  Session-window state
    is merged incrementally per key and evicted once the watermark passes
    a session's close — bounded state at any ingest rate."""
    from star_schema_etl_airflow_spark.plans.events_queries import SESSION_GAP

    ev = stream_events(spark, sf_dir)
    return (
        ev.withWatermark("ts", WATERMARK)
        .groupBy("user_id", F.session_window("ts", SESSION_GAP))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_sessionize_to_memory(spark: SparkSession, sf_dir: str,
                             name: str = "stream_sessions") -> DataFrame:
    """Run the streaming sessionization to completion.  Complete mode:
    session-window aggregations reject update mode (sessions merge, so an
    update would have to retract rows); complete re-emits full state per
    trigger, which the single availableNow batch makes equivalent to the
    batch twin."""
    q = (
        streaming_sessionize(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)
