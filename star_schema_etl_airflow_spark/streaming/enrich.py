"""Stream-static enrichment, sliding-window aggregation, and the
foreachBatch upsert sink — the rest of the streaming surface a star-schema
engine needs (the reference is daily batch; SURVEY.md §2.9 extension).

- Stream-static join: every micro-batch joins against the (broadcast)
  dimension snapshot — the streaming twin of the datamart enrich join
  (J4).  Stateless: no watermark, no state store.
- Sliding windows: overlapping 1h/30m windows; the batch twin
  (``plans/events_queries.py::events_sliding``) is DuckDB-oracle-checked,
  so the streaming path inherits a differential oracle.
- foreachBatch upsert: turns an at-least-once stream into an
  exactly-once-by-key parquet target by running the batch MERGE
  (``operators/merge.py``) per micro-batch — the standard Spark pattern
  for sinks without native MERGE.  At 100 TB the parquet target becomes
  a Delta/Iceberg table and the swap becomes its atomic MERGE commit;
  the per-batch logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.streaming.ingest import (
    WATERMARK,
    _as_dup_stream_dir,
    EVENTS_RAW_SCHEMA,
    stream_events,
)


def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked sliding-window rollup (streaming twin of
    ``events_sliding``)."""
    ev = stream_events(spark, sf_dir)
    return (
        ev.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static enrichment dimension: customer keyed by user_id."""
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_nationkey").alias("nationkey"),
    )


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level stream-static enrichment (append-mode safe: stateless)."""
    ev = stream_events(spark, sf_dir)
    dim = customer_dim(spark, sf_dir)
    return ev.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "ts", "user_id", "mktsegment", "nationkey", "value"
    )


def run_sliding_to_memory(spark: SparkSession, sf_dir: str,
                          name: str = "stream_sliding") -> DataFrame:
    q = (
        streaming_sliding(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def run_enrich_to_memory(spark: SparkSession, sf_dir: str,
                         name: str = "stream_enrich") -> DataFrame:
    q = (
        stream_static_enrich(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def run_upsert_sink(spark: SparkSession, sf_dir: str, target_path: str) -> DataFrame:
    """Drive the doubled-delivery landing dir through a foreachBatch MERGE
    into a parquet target, one file per micro-batch (``maxFilesPerTrigger
    =1`` forces the cross-batch upsert path, not just in-batch dedup).
    Returns the final target as a batch DataFrame — exactly one row per
    event_id regardless of duplicate delivery."""
    from star_schema_etl_airflow_spark.operators.merge import merge_upsert
    from star_schema_etl_airflow_spark.sources.io import write_swap

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(_as_dup_stream_dir(sf_dir))
    )
    from star_schema_etl_airflow_spark.streaming.ingest import ts_from_long

    stream = ts_from_long(stream)

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        src = batch_df.dropDuplicates(["event_id"])
        import os

        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            write_swap(merge_upsert(target, src, keys=["event_id"]), target_path)
        else:
            src.write.parquet(target_path)

    q = (
        stream.writeStream.foreachBatch(_upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(target_path)
