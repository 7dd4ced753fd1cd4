"""Standing top-k retrieval lists maintained as a streaming job: delta
document batches land as files and each micro-batch is scored against
the FROZEN at-rest BM25 statistics, then merged into the persisted
per-query top-k table — the arrival-driven twin of
``plans/retrieval_incremental.py::bm25_delta_probe``.

Design notes:
- ``foreachBatch`` over a swap-published parquet table (the
  ``kmv_stream`` pattern): the standing top-k IS the state, it is
  k-bounded (queries × k rows forever), and consumers want it as a
  queryable table.  Merge = union the batch's scores → distinct →
  re-rank → cut at k.
- Exactness of the fold: under frozen statistics a document's score
  never changes, so a doc cut from the list was dominated by ≥ k docs
  whose rows the merge keeps — the k-deep list is sufficient state and
  the fold equals the one-shot batch probe over all rows ever ingested
  (order- and batching-independent; pinned in
  ``tests/test_retrieval_stream.py``).  ``distinct()`` before the
  re-rank makes at-least-once re-delivery a no-op (same doc, same
  frozen score).
- Publish is the shared rename-aside swap with ``recover_swap``
  adoption at the top of each micro-batch (crash-safe; a complete list
  exists at every instant).
- At 100 TB the per-batch cost is one batch-sized tokenize+score
  against the broadcast query index plus a (queries × k)-sized merge —
  flat in corpus size (the corpus participates only through the frozen
  index, materialized once per corpus version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.bm25 import (
    TOP_K,
    bm25_score_with_index,
)
from star_schema_etl_airflow_spark.sources.io import (
    _target_exists,
    publish_swap,
    recover_swap,
)


def merge_topk(existing: DataFrame | None, delta_scores: DataFrame) -> DataFrame:
    """top-k(existing ∪ delta) per query; ``existing`` may be None
    (first batch).  Idempotent under frozen statistics: re-merging the
    same delta adds only duplicate (query, doc, score) rows, which
    ``distinct`` collapses."""
    rel = (
        delta_scores if existing is None
        else existing.unionByName(delta_scores).distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        rel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "doc_id", "score")
    )



def run_retrieval_stream(
    spark: SparkSession,
    landing_dir: str,
    state_path: str,
    source_schema,
    qidf: DataFrame,
) -> DataFrame:
    """Consume all pending delta files (availableNow, one file per
    micro-batch), scoring each against the frozen index ``qidf`` and
    folding into the standing top-k table; returns the final lists."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # explicit existence check + sibling adoption, never a silent
        # rebuild from one batch (the kmv_stream/dedup_stream rationale)
        recover_swap(state_path)
        existing = (
            spark.read.parquet(state_path)
            if _target_exists(state_path, spark)
            else None
        )
        scores = bm25_score_with_index(
            batch_df.select("doc_id", "text"), qidf
        )
        publish_swap(merge_topk(existing, scores), state_path)

    query = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", state_path.rstrip("/") + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if not _target_exists(state_path, spark):
        # zero micro-batches (or all empty): no list was ever published
        return spark.createDataFrame(
            [], "query_id int, doc_id long, score decimal(38,9)"
        )
    return spark.read.parquet(state_path)
