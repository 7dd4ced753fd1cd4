"""Curation pipeline v4 — importance-targeted, language-balanced,
leakage-safe selection, end-to-end as ONE differential query:

  near-dup clustering → leakage-safe split (cluster-hashed) → keep the
  TRAIN canonicals → DSIR importance scores against the in-domain
  target sample → UniMax water-filled per-language quotas → top-quota
  documents per language by DSIR weight.

v1 is the quality-gate funnel, v2 the boilerplate/decontam funnel, v3
query-targeted BM25 mining; v4 is the distribution-shaping recipe — the
selection is simultaneously deduplicated (one survivor per near-dup
cluster), leakage-safe (eval splits can never share a cluster with
train), relevance-weighted (DSIR log-ratios), and language-balanced
(UniMax).  Every stage is the registry operator it reuses
(``dedup_clusters``, ``hash_split``, ``dsir_weights``,
``waterfill_allocation``); the pipeline query proves the COMPOSITION
against one chained-CTE oracle, value-hash exact.

Scale shape: clustering is the only candidate-pair stage (LSH-banded);
DSIR adds two map-side-combine shuffles against a broadcast 1024-bucket
table; the allocation is control-plane sized; the final per-language
rank is bounded by the quota.  All scores are micro-ln BIGINTs — the
selected set is a pure function of the data under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.sampling import (
    hash_split,
    threshold,
)
from star_schema_etl_airflow_spark.plans.dsir import (
    SPLIT_CUTS,
    SPLIT_SEED,
    dsir_weight_ctes,
    dsir_weights,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import (
    CORPUS_DUCK,
    DEDUP_CLUSTERS_ORACLE,
    build_corpus,
    dedup_clusters,
)
from star_schema_etl_airflow_spark.plans.unimax import (
    unimax_alloc_ctes,
    waterfill_allocation,
)
from star_schema_etl_airflow_spark.functions.text import md5_long_duck
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

# synthetic near/exact duplicate ids live at base_id + k·1e6
_BASE_MOD = 1_000_000


def curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1) near-dup clusters → leakage-safe split → TRAIN canonicals
    comp = dedup_clusters(spark, sf_dir)
    split = hash_split(
        comp, "cast(cluster_id as string)", SPLIT_SEED, SPLIT_CUTS
    )
    canon_train = split.filter(
        (F.col("doc_id") == F.col("cluster_id"))
        & (F.col("split") == "train")
    ).select("doc_id")

    # 2) DSIR importance weights over the cleaned train corpus
    corpus = build_corpus(spark, sf_dir)
    train_docs = corpus.join(F.broadcast(canon_train), "doc_id")
    weights = dsir_weights(train_docs)

    # 3) language of each survivor (synthetic dup ids map to their base)
    langs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("base_id"), "lang"
    )
    wl = weights.withColumn(
        "base_id", F.col("doc_id") % _BASE_MOD
    ).join(F.broadcast(langs), "base_id").select(
        "doc_id", "lang", "log_weight_micro"
    )

    # 4) UniMax quotas over the scored candidates; head per language
    alloc = waterfill_allocation(wl).select("lang", "alloc_docs")
    w = Window.partitionBy("lang").orderBy(
        F.col("log_weight_micro").desc(), F.col("doc_id")
    )
    return (
        wl.join(F.broadcast(alloc), "lang")
        .withColumn("lang_rank", F.row_number().over(w))
        .filter(F.col("lang_rank") <= F.col("alloc_docs"))
        .select("doc_id", "lang", "log_weight_micro", "lang_rank")
    )


def _v4_oracle() -> str:
    train_hi = threshold(SPLIT_CUTS["train"])
    return f"""
WITH clusters AS ({DEDUP_CLUSTERS_ORACLE}),
canon_train AS (
  SELECT doc_id FROM clusters
  WHERE doc_id = cluster_id
    AND ({md5_long_duck('CAST(cluster_id AS VARCHAR)', SPLIT_SEED)})
        % 10000 < {train_hi}
),
corpus2 AS ({CORPUS_DUCK}),
train_docs AS (
  SELECT c.doc_id, c.text FROM corpus2 c JOIN canon_train USING (doc_id)
),
{dsir_weight_ctes('train_docs')},
wl AS (
  SELECT w.doc_id, d.lang, w.log_weight_micro
  FROM w JOIN documents d ON d.doc_id = w.doc_id % {_BASE_MOD}
),
{unimax_alloc_ctes('wl')},
ranked AS (
  SELECT wl.doc_id, wl.lang, wl.log_weight_micro,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY wl.lang
           ORDER BY wl.log_weight_micro DESC, wl.doc_id
         ) AS INTEGER) AS lang_rank,
         a.alloc_docs
  FROM wl JOIN alloc a USING (lang)
)
SELECT doc_id, lang, log_weight_micro, lang_rank
FROM ranked WHERE lang_rank <= alloc_docs
"""


# MATERIALIZED CTEs (r15): the v4 chain references its stage CTEs
# repeatedly and DuckDB inlining re-evaluated them per reference —
# 17.3s -> 0.51s at sf0.01, identical rows
from star_schema_etl_airflow_spark.plans.ivfpq import mat_ctes as _mat  # noqa: E402

register(QuerySpec("curation_pipeline_v4", curation_pipeline_v4,
                   _mat(_v4_oracle()), tags=("LLM-PIPELINE",)))
