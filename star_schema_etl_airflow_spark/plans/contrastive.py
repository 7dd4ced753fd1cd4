"""Contrastive-pair mining over the ``embeddings`` fixture — the data-prep
step for training retrieval/embedding models (in-batch negatives are not
enough; hard negatives — high-cosine, wrong-label — drive contrastive
loss quality; cf. Karpukhin et al., "Dense Passage Retrieval", EMNLP'20).

Two mining shapes per anchor (query) vector:

- ``hard_negatives``: the top-``NEG_K`` candidates by cosine whose label
  DIFFERS from the anchor's (confusable wrong answers).
- the paired positive: the single top-cosine candidate SHARING the
  anchor's label, carried on every row so each output row is a ready
  (anchor, positive, negative) training triplet.

Cosine arithmetic follows the repo contract (``plans/llm_similarity.py``):
unrolled 64-dim double fold in array order on both engines, rounded to 9
decimals before ranking, ties broken on candidate id — rank order is
engine-independent.

Scale design (100 TB of vectors): the anchor set is control-plane sized
and broadcast; candidates stream map-only through one scan that scores
BOTH minings (the label predicate splits rows after scoring, so the
corpus is read once, not twice).  Each per-anchor ranking is a
``row_number`` window whose shuffle is bounded map-side by Catalyst's
partial ``WindowGroupLimit`` (each scan partition forwards at most K rows
per anchor — the same pinned shape as ``embed_topk_cosine``).  The
positive join is |anchors| rows to |anchors|·NEG_K rows — control-plane
sized on both sides.

Reference parity: beyond-reference (LLM-pipeline extension; the
reference has no embedding operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.llm_similarity import (
    N_QUERIES,
    _cos_duck,
    _COS_SPARK,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

NEG_K = 5   # hard negatives kept per anchor


def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, hard-negative) triplets: per anchor the top
    ``NEG_K`` wrong-label candidates by cosine, each row carrying the
    anchor's best same-label candidate as the positive."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        "embedding",
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        "embedding",
    )
    # ONE scoring scan; the same-label flag routes rows to the two
    # minings afterwards (never two passes over the corpus).
    scored = (
        F.broadcast(q).alias("q")
        .crossJoin(c.alias("c"))
        .select(
            "anchor_id",
            "anchor_label",
            "cand_id",
            "cand_label",
            F.expr(_COS_SPARK).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    negs = (
        scored.filter(F.col("cand_label") != F.col("anchor_label"))
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= NEG_K)
        .select(
            "anchor_id",
            "anchor_label",
            F.col("cand_id").alias("neg_id"),
            F.col("cand_label").alias("neg_label"),
            F.col("cosine").alias("neg_cosine"),
            "neg_rank",
        )
    )
    pos = (
        scored.filter(F.col("cand_label") == F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("pos_id"),
            F.col("cosine").alias("pos_cosine"),
        )
    )
    return negs.join(F.broadcast(pos), "anchor_id").select(
        "anchor_id",
        F.col("anchor_label").cast("int").alias("anchor_label"),
        "pos_id",
        "pos_cosine",
        "neg_id",
        F.col("neg_label").cast("int").alias("neg_label"),
        "neg_cosine",
        F.col("neg_rank").cast("int").alias("neg_rank"),
    )


HARD_NEGATIVES_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS cand_id, label AS cand_label, embedding
  FROM embeddings WHERE vec_id >= {N_QUERIES}
),
scored AS (
  SELECT q.anchor_id, q.anchor_label, c.cand_id, c.cand_label,
         {_cos_duck('q.embedding', 'c.embedding')} AS cosine
  FROM q CROSS JOIN c
),
negs AS (
  SELECT anchor_id, anchor_label, cand_id AS neg_id,
         cand_label AS neg_label, cosine AS neg_cosine,
         ROW_NUMBER() OVER (
           PARTITION BY anchor_id ORDER BY cosine DESC, cand_id
         ) AS neg_rank
  FROM scored WHERE cand_label <> anchor_label
),
pos AS (
  SELECT anchor_id, cand_id AS pos_id, cosine AS pos_cosine
  FROM (
    SELECT anchor_id, cand_id, cosine,
           ROW_NUMBER() OVER (
             PARTITION BY anchor_id ORDER BY cosine DESC, cand_id
           ) AS rn
    FROM scored WHERE cand_label = anchor_label
  ) WHERE rn = 1
)
SELECT n.anchor_id, CAST(n.anchor_label AS INTEGER) AS anchor_label,
       p.pos_id, p.pos_cosine,
       n.neg_id, CAST(n.neg_label AS INTEGER) AS neg_label,
       n.neg_cosine, CAST(n.neg_rank AS INTEGER) AS neg_rank
FROM negs n JOIN pos p USING (anchor_id)
WHERE n.neg_rank <= {NEG_K}
"""

register(QuerySpec("hard_negatives", hard_negatives, HARD_NEGATIVES_ORACLE,
                   tags=("llm", "contrastive")))
