"""Curation pipeline v3 — query-TARGETED data selection, end-to-end as
one differential query: exact dedup → BM25 relevance against the fixed
query set → top-K per query → deterministic train/val split.

This is the "mine task-relevant training data" recipe (rank a cleaned
corpus against seed queries, keep the head, split reproducibly) that
complements v1's quality-gate funnel and v2's boilerplate/decontam
funnel.  Every stage is the registry operator it reuses — the pipeline
query proves the COMPOSITION (dedup feeding retrieval feeding split)
against one chained-CTE oracle, value-hash exact.

Scale shape: dedup is the only corpus-wide shuffle (60-bit content
hash); BM25's query-term index broadcasts, so scoring adds no corpus
shuffle (see plans/bm25.py); the split is a map-side hash; top-K is a
partial window limit.  Stage order matters at 100 TB: dedup FIRST
shrinks everything downstream and keeps duplicate documents from
flooding the per-query head with identical text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    md5_long_spark,
)
from star_schema_etl_airflow_spark.plans.bm25 import (
    bm25_scored_ctes,
    bm25_scores,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

V3_TOP_K = 20
V3_SPLIT_SEED = "curation-v3"
V3_TRAIN_BUCKETS = 8  # of 10 → 80/20 train/val


def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    # 1) exact dedup: canonical survivor = min doc_id per content hash
    survivors = (
        docs.withColumn("h", F.expr(md5_long_spark("text")))
        .groupBy("h")
        .agg(F.min(F.struct("doc_id", "text", "source")).alias("k"))
        .select("k.doc_id", "k.text", "k.source")
    )
    # 2) BM25 relevance of the cleaned corpus against the seed queries
    scored = bm25_scores(spark, survivors.select("doc_id", "text"))
    # 3) head of each query's ranking
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    head = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= V3_TOP_K)
    )
    # 4) reproducible 80/20 split + provenance
    split = F.when(
        F.expr(md5_long_spark("cast(doc_id as string)", V3_SPLIT_SEED)) % 10
        < V3_TRAIN_BUCKETS,
        "train",
    ).otherwise("val")
    return (
        head.join(F.broadcast(survivors.select("doc_id", "source")), "doc_id")
        .select(
            "query_id", "rank", "doc_id", "source",
            # decimal internal (exact ranking), double at the edge
            F.col("score").cast("double").alias("score"),
            split.alias("split"),
        )
    )


V3_ORACLE = f"""
WITH survivors AS (
  SELECT doc_id, text, source
  FROM (
    SELECT doc_id, text, source,
           ROW_NUMBER() OVER (
             PARTITION BY {md5_long_duck('text')} ORDER BY doc_id
           ) AS rn
    FROM documents
  )
  WHERE rn = 1
),
{bm25_scored_ctes("survivors")},
head AS (
  SELECT query_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT h.query_id, h.rank, h.doc_id, s.source,
       CAST(h.score AS DOUBLE) AS score,
       CASE WHEN {md5_long_duck('CAST(h.doc_id AS VARCHAR)', V3_SPLIT_SEED)}
                 % 10 < {V3_TRAIN_BUCKETS}
            THEN 'train' ELSE 'val' END AS split
FROM head h
JOIN survivors s ON s.doc_id = h.doc_id
WHERE h.rank <= {V3_TOP_K}
"""

register(QuerySpec("curation_pipeline_v3", curation_pipeline_v3, V3_ORACLE,
                   tags=("LLM-PIPELINE",)))
