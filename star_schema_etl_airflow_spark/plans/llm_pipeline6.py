"""Curation pipeline v6 — the round-13 selection operators composed
end-to-end: TTR curriculum staging → temperature-balanced per-language
quotas → the epoch-1 training set.

The recipe answers "what does the data loader read on day one":
documents are staged easy → hard per language (``plans/curriculum.py``,
NTILE over the TTR difficulty proxy with a seeded within-language
shuffle), every language gets a T=2 temperature quota
(``plans/llm_sampling.py::mixture_temperature``'s sqrt-tempered shares,
scaled to half the corpus — low-resource languages are deliberately
over-represented relative to their raw share), and the epoch keeps each
language's first ``quota`` documents in curriculum order.  Every stage
is the registry operator it reuses — the pipeline proves the
COMPOSITION against one chained-CTE oracle.

Scale shape: staging is the per-language window family (exact spec;
approx-percentile cut-points are the corpus-scale path, see
``quality_gate_approx``); the quota table is |languages| rows,
broadcast; the selection is a map-side comparison against the
broadcast quota.  No stage shuffles more than the staging windows.

Reference parity: beyond-reference (LLM-pipeline composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.curriculum import (
    CURRICULUM_STAGED_CTES,
    staged_documents,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register

V6_EPOCH_FRAC = 0.5   # epoch budget as a fraction of the corpus


def curation_pipeline_v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = staged_documents(spark, sf_dir)
    w_lang = Window.partitionBy("lang").orderBy(
        F.col("stage").asc(), F.col("shuf").asc(), F.col("doc_id").asc()
    )
    pos = staged.withColumn("lang_pos", F.row_number().over(w_lang))
    counts = pos.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).withColumn("sq", F.sqrt(F.col("n_docs").cast("double")))
    totals = counts.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.col("sq").cast("decimal(38,12)")).alias("sq_total"),
    )
    quota = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            F.least(
                F.col("n_docs"),
                F.round(
                    F.col("sq") / F.col("sq_total").cast("double")
                    * F.lit(V6_EPOCH_FRAC)
                    * F.col("n_total").cast("double"),
                    0,
                ).cast("long"),
            ).alias("quota"),
        )
    )
    return (
        pos.join(F.broadcast(quota), "lang")
        .filter(F.col("lang_pos") <= F.col("quota"))
        .select(
            "doc_id",
            "lang",
            F.col("stage").cast("int").alias("stage"),
            F.col("lang_pos").cast("long").alias("lang_pos"),
            F.col("quota").cast("long").alias("quota"),
        )
    )


PIPELINE_V6_ORACLE = f"""
WITH {CURRICULUM_STAGED_CTES},
pos AS (
  SELECT doc_id, lang, stage,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY stage ASC, shuf ASC, doc_id ASC
         ) AS lang_pos
  FROM staged
),
counts AS (
  SELECT lang, COUNT(*) AS n_docs,
         sqrt(CAST(COUNT(*) AS DOUBLE)) AS sq
  FROM pos GROUP BY lang
),
totals AS (
  SELECT SUM(n_docs) AS n_total,
         SUM(CAST(sq AS DECIMAL(38,12))) AS sq_total
  FROM counts
),
quota AS (
  SELECT c.lang,
         LEAST(c.n_docs,
               CAST(ROUND(c.sq / CAST(t.sq_total AS DOUBLE)
                          * {V6_EPOCH_FRAC!r}
                          * CAST(t.n_total AS DOUBLE), 0) AS BIGINT))
           AS quota
  FROM counts c CROSS JOIN totals t
)
SELECT p.doc_id, p.lang,
       CAST(p.stage AS INTEGER) AS stage,
       CAST(p.lang_pos AS BIGINT) AS lang_pos,
       CAST(q.quota AS BIGINT) AS quota
FROM pos p JOIN quota q ON p.lang = q.lang
WHERE p.lang_pos <= q.quota
"""

register(QuerySpec("curation_pipeline_v6", curation_pipeline_v6,
                   PIPELINE_V6_ORACLE, tags=("llm", "PIPELINE")))
