"""Incremental exact-substring dedup as a streaming job: each arriving
ingest batch is span-deduplicated against the grams of everything
already accepted (and against itself), EXCISED, and the cleaned
documents are appended — the arrival-driven twin of
``plans/substring_queries.dedup_substring_incremental``.

Design notes (same architecture as ``streaming/dedup_stream.py``):
- ``foreachBatch``, not state-store state: the dedup horizon is the
  whole accepted-corpus gram set, which lives in a persisted gram-index
  table (8 bytes per distinct gram at rest; bucketed by gram at scale
  so the probe co-locates and the index never shuffles).
- The index holds the grams of the CLEANED accepted text (the corpus
  stores exactly that text, so the index mirrors the corpus — an
  excised span cannot re-admit itself via a stale gram).
- History is immutable: a later arrival can never excise an earlier
  acceptance, so a stream fold equals the SEQUENTIAL batch fold over
  the same deltas (pinned by ``tests/test_substring_stream.py``), not
  the one-shot corpus-wide ExactSubstr — which is the point of the
  incremental semantic.
- Idempotence across redelivery: a replayed batch's content re-probes
  the (now-updated) index, so its spans excise fully and the min-id
  canonical rule keeps appends deterministic; documents shorter than
  n tokens carry zero grams, so they are additionally guarded by a
  doc_id anti-join against the corpus; exactly-once of the append
  itself comes from the streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.decontaminate import (
    positional_gram_hashes,
)
from star_schema_etl_airflow_spark.operators.substring_dedup import (
    SUBSTR_NGRAM,
    excise_spans,
)
from star_schema_etl_airflow_spark.sources.io import _target_exists


def _batch_dup_positions(
    corpus_grams: DataFrame | None,
    batch: DataFrame,
    text_col: str,
    n: int,
) -> DataFrame:
    """(doc_id, pos) of every batch gram that exists in the accepted
    index or repeats within the batch (first batch occurrence wins)."""
    pos = batch.select(
        "doc_id",
        F.posexplode(
            F.expr(positional_gram_hashes(text_col, n))
        ).alias("pos", "g"),
    )
    stats = (
        pos.groupBy("g")
        .agg(F.count("*").alias("occ"),
             F.min(F.struct("doc_id", "pos")).alias("first"))
        .filter(F.col("occ") > 1)
    )
    internal = (
        pos.join(stats, "g")
        .filter(~((F.col("doc_id") == F.col("first.doc_id"))
                  & (F.col("pos") == F.col("first.pos"))))
        .select("doc_id", "pos")
    )
    if corpus_grams is None:
        return internal.distinct()
    vs_corpus = pos.join(corpus_grams, "g", "left_semi").select(
        "doc_id", "pos"
    )
    return vs_corpus.unionByName(internal).distinct()


def excise_batch_against(
    corpus_grams: DataFrame | None,
    batch: DataFrame,
    text_col: str = "text",
    n: int = SUBSTR_NGRAM,
) -> DataFrame:
    """One ingest batch span-deduped and excised: (doc_id, clean_text,
    kept_tokens, dropped_tokens).  ``corpus_grams`` is the accepted
    gram-hash index (one ``g`` column) or None on day 0."""
    from pyspark.sql import Window

    dup_pos = _batch_dup_positions(corpus_grams, batch, text_col, n)
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        dup_pos.withColumn(
            "new_span",
            (F.coalesce(F.col("pos") - F.lag("pos").over(w),
                        F.lit(n + 1)) > n).cast("long"),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "span_id")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + n).alias("span_end"))
        .select(
            "doc_id", "span_start", "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )
    return excise_spans(batch, spans, text_col=text_col)


def run_substring_stream(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    index_path: str,
    source_schema,
    text_col: str = "text",
    n: int = SUBSTR_NGRAM,
) -> DataFrame:
    """Consume all pending ingest files (availableNow, one file per
    micro-batch), fold each through :func:`excise_batch_against`,
    append cleaned docs to the corpus and their grams to the index;
    returns the final corpus."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # explicit existence check, never except-as-day-0 (see
        # streaming/dedup_stream.py for the failure-mode rationale)
        grams = (
            spark.read.parquet(index_path)
            if _target_exists(index_path, spark)
            else None
        )
        cleaned = excise_batch_against(grams, batch_df, text_col, n)
        # drop fully-excised documents: they contribute no text, and a
        # REDELIVERED batch (whose every gram is now indexed) excises
        # to nothing — so replays append nothing, keeping the corpus
        # idempotent across delivery faults
        cleaned = cleaned.filter(F.col("kept_tokens") > 0)
        # gram-based replay protection has a hole: a document shorter
        # than n tokens carries ZERO grams, so a redelivered batch
        # re-probes nothing and would append it twice.  Close it with a
        # doc_id anti-join against the corpus — a column-pruned scan of
        # one long column (bucketed by doc_id at rest, so the probe
        # co-locates), same at-rest probe shape as the gram index below.
        if _target_exists(corpus_path, spark):
            cleaned = cleaned.join(
                spark.read.parquet(corpus_path).select("doc_id"),
                "doc_id", "left_anti",
            )
        cleaned.write.mode("append").parquet(corpus_path)
        new_grams = cleaned.select(
            F.explode(
                F.expr(positional_gram_hashes("clean_text", n))
            ).alias("g")
        ).distinct()
        if grams is not None:
            new_grams = new_grams.join(grams, "g", "left_anti")
        new_grams.write.mode("append").parquet(index_path)

    query = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", corpus_path + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(corpus_path)
