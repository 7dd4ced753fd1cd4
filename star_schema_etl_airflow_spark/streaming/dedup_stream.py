"""Incremental corpus dedup as a streaming job: ingest batches land as
files and each micro-batch is deduplicated against the already-accepted
corpus (and internally) before being appended — the arrival-driven twin
of ``plans/llm_dedup2.py::dedup_incremental``.

Design notes:
- ``foreachBatch`` rather than ``dropDuplicates`` state: the dedup
  horizon is the WHOLE corpus history, which belongs in a persisted
  table, not the state store (unbounded state, no watermark can bound
  exact dedup).  The corpus parquet doubles as the hash index — at
  scale the index is its own bucketed (content_hash) table so the probe
  co-locates; the swap is one line at the read/append call sites.
- Survivor selection inside a batch is min(doc_id) per content hash —
  the same canonical-pick rule as the batch operator, so a stream fold
  of N batches equals the batch pipeline run over the same N deltas
  (pinned by ``tests/test_dedup_stream.py``).
- Appends are idempotent per content hash ACROSS batches (a re-delivered
  duplicate is caught by the index probe); exactly-once of the append
  itself comes from the streaming checkpoint as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from star_schema_etl_airflow_spark.functions.text import md5_long_spark
from star_schema_etl_airflow_spark.sources.io import _target_exists


def dedup_batch_against(
    corpus: DataFrame | None,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Survivors of one ingest batch: drop rows whose content hash exists
    in ``corpus`` (anti join on the 8-byte hash), then keep the lowest id
    per hash within the batch.  ``corpus`` may be None (day 0)."""
    from pyspark.sql import functions as F

    hashed = batch.select(
        F.col(id_col),
        F.col(text_col),
        F.expr(md5_long_spark(text_col)).alias("content_hash"),
    )
    if corpus is not None:
        hashed = hashed.join(
            corpus.select("content_hash"), "content_hash", "left_anti"
        )
    return (
        hashed.groupBy("content_hash")
        .agg(F.min(F.struct(id_col, text_col)).alias("keep"))
        .select(
            F.col(f"keep.{id_col}").alias(id_col),
            F.col(f"keep.{text_col}").alias(text_col),
            "content_hash",
        )
    )


def run_dedup_stream(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    source_schema,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Consume all pending ingest files (availableNow, one file per
    micro-batch) and fold each through :func:`dedup_batch_against`,
    appending survivors to the corpus; returns the final corpus."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Day-0 detection must be an explicit existence check, not a broad
        # except: treating a transient read failure (corruption, IO,
        # permissions) as "empty corpus" would append the batch undeduped
        # and permanently admit duplicates.  Any real read error re-raises
        # and fails the micro-batch, which the checkpoint then retries.
        corpus = (
            spark.read.parquet(corpus_path)
            if _target_exists(corpus_path, spark)
            else None
        )
        survivors = dedup_batch_against(corpus, batch_df, id_col, text_col)
        survivors.write.mode("append").parquet(corpus_path)

    query = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", corpus_path + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(corpus_path)
