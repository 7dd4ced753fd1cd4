"""Curation pipeline v7 — the round-14 signals composed end-to-end
(r14 verdict task 4): drift gate in front, SoftDeDup duplication
weights × DoReMi domain mixture × RHO-LOSS learnability, one audited
epoch selection.

The recipe, stage by stage (each the registry operator it reuses):

1. **Gate** — the PSI drift monitor's verdict over the standing
   at-rest/ingest split (``plans/corpus_drift.py``) rides every output
   row as ``(psi_total, gate_action)``; the side-effecting form (the
   refresh publish inside the audited runner) is
   ``plans/drift_gate.py`` and the e2e test composes it in front.
2. **Mixture** — DoReMi's final-round domain weights
   (``plans/doremi.py``) set each language's share of the epoch
   budget: ``quota = (budget · w_lang) div Σw`` — integer arithmetic
   on the already-rounded micro weights, exact in both engines.
3. **Priority** — a document's selection priority is its RHO-LOSS
   learnability gap, SoftDeDup-discounted:
   ``eff = ((rho − min_rho + 1) · weight_nano) div SOFT_SCALE``.
   The shift makes the gap positive so the discount is monotone
   (``weight_nano = SOFT_SCALE / cluster_size``), giving duplicated
   pages exactly ``1/size`` of their unique-page priority — the
   SoftDeDup expected-mass semantics applied to ranking instead of
   sampling.  All-integer: shift, product (< 2e17 ≪ 2^63), floor-div.
4. **Select** — within each language, rank by (eff desc, rho desc,
   doc_id) and keep ``lang_pos ≤ quota``.

Scale shape: gate and mixture are language-grain broadcasts; the RHO
scorer is the single-scan n-gram identity family; SoftDeDup joins the
banded LSH clusters (never all-pairs); selection is one per-language
window whose exchange the quota bounds.  No stage is corpus-quadratic.

Reference parity: beyond-reference (LLM-pipeline composition).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.plans.corpus_drift import (
    CORPUS_DRIFT_ORACLE,
    corpus_drift_psi,
)
from star_schema_etl_airflow_spark.plans.doremi import (
    _round_cte,
    _STATS_CTES,
    RHO_LOSS_ORACLE,
    T_ROUNDS,
    doremi_mixture_weights,
    rho_scored,
)
from star_schema_etl_airflow_spark.plans.drift_gate import (
    PSI_ACTION_THRESHOLD,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import (
    SOFT_SCALE,
    SOFTDEDUP_ORACLE,
    softdedup_weights,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

V7_EPOCH_FRAC = 0.5   # epoch budget as a fraction of the scoreable corpus


def curation_pipeline_v7(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")

    # gate verdict (1 row, broadcast onto every output row)
    psi = corpus_drift_psi(spark, sf_dir).agg(
        F.round(F.coalesce(F.sum("psi_term"), F.lit(0.0)), 9)
        .alias("psi_total")
    ).select(
        "psi_total",
        F.when(F.col("psi_total") > PSI_ACTION_THRESHOLD,
               F.lit("refresh_mixture"))
        .otherwise(F.lit("noop")).alias("gate_action"),
    )

    # per-doc learnability × duplication discount
    soft = softdedup_weights(spark, sf_dir).select("doc_id", "weight_nano")
    m = persist_once(
        rho_scored(spark, sf_dir)
        .join(docs, "doc_id")
        .join(soft, "doc_id", "left")
        .select(
            "doc_id", "lang", "rho_micro",
            F.coalesce("weight_nano", F.lit(SOFT_SCALE))
            .alias("soft_weight_nano"),
        )
    )
    rho_min = m.agg(F.min("rho_micro").alias("rho_min"))
    scored = m.crossJoin(F.broadcast(rho_min)).select(
        "doc_id", "lang", "rho_micro", "soft_weight_nano",
        F.expr(
            "(rho_micro - rho_min + 1) * soft_weight_nano "
            f"div {SOFT_SCALE}"
        ).alias("eff_score"),
    )

    # DoReMi final-round mixture → integer per-language quotas
    mix = doremi_mixture_weights(spark, sf_dir).filter(
        F.col("round") == T_ROUNDS
    ).select("lang", "weight_micro")
    budget = scored.agg(
        F.floor(F.count(F.lit(1)) * F.lit(V7_EPOCH_FRAC))
        .cast("long").alias("budget")
    )
    wsum = mix.agg(F.sum("weight_micro").alias("wsum"))
    quota = (
        mix.crossJoin(F.broadcast(budget)).crossJoin(F.broadcast(wsum))
        .select(
            "lang",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr("budget * weight_micro div wsum"),
            ).alias("quota"),
        )
    )

    wl = Window.partitionBy("lang").orderBy(
        F.col("eff_score").desc(), F.col("rho_micro").desc(),
        F.col("doc_id").asc(),
    )
    return (
        scored.join(F.broadcast(quota), "lang")
        .withColumn("lang_pos", F.row_number().over(wl))
        .filter(F.col("lang_pos") <= F.col("quota"))
        .crossJoin(F.broadcast(psi))
        .select(
            "doc_id", "lang", "rho_micro",
            F.col("soft_weight_nano").cast("long")
            .alias("soft_weight_nano"),
            F.col("eff_score").cast("long").alias("eff_score"),
            F.col("lang_pos").cast("long").alias("lang_pos"),
            F.col("quota").cast("long").alias("quota"),
            "psi_total", "gate_action",
        )
    )


def _v7_oracle() -> str:
    # the RHO chain at doc grain re-prefixed rh_ so it can coexist with
    # the doremi lang-grain chain, which owns the dm_ names
    rho_ctes = RHO_LOSS_ORACLE.split("\nSELECT doc_id,")[0]
    rho_ctes = rho_ctes.split("WITH ", 1)[1]
    rho_ctes = re.sub(r"\bdm_", "rh_", rho_ctes)
    doremi_ctes = _STATS_CTES + "," + ",".join(
        _round_cte(t) for t in range(1, T_ROUNDS + 1)
    )
    return f"""
WITH {rho_ctes},
{doremi_ctes},
v7_gate AS (
  SELECT psi_total,
         CASE WHEN psi_total > {PSI_ACTION_THRESHOLD!r}
              THEN 'refresh_mixture' ELSE 'noop' END AS gate_action
  FROM (
    SELECT ROUND(COALESCE(SUM(psi_term), 0.0), 9) AS psi_total
    FROM ({CORPUS_DRIFT_ORACLE})
  )
),
v7_soft AS (
  SELECT doc_id, weight_nano FROM ({SOFTDEDUP_ORACLE})
),
v7_m AS (
  SELECT r.doc_id, d.lang,
         r.l_uni_micro - b.l_bi_micro AS rho_micro,
         COALESCE(s.weight_nano, {SOFT_SCALE}) AS soft_weight_nano
  FROM rh_uni r
  JOIN rh_bi b ON r.doc_id = b.doc_id
  JOIN documents d ON d.doc_id = r.doc_id
  LEFT JOIN v7_soft s ON s.doc_id = r.doc_id
),
v7_min AS (SELECT MIN(rho_micro) AS rho_min FROM v7_m),
v7_scored AS (
  SELECT m.doc_id, m.lang, m.rho_micro, m.soft_weight_nano,
         (m.rho_micro - x.rho_min + 1) * m.soft_weight_nano
           // {SOFT_SCALE} AS eff_score
  FROM v7_m m CROSS JOIN v7_min x
),
v7_budget AS (
  SELECT CAST(FLOOR(COUNT(*) * {V7_EPOCH_FRAC!r}) AS BIGINT) AS budget
  FROM v7_scored
),
v7_wsum AS (SELECT SUM(weight_micro) AS wsum FROM dm_w{T_ROUNDS}),
v7_quota AS (
  SELECT w.lang,
         GREATEST(CAST(1 AS BIGINT),
                  b.budget * w.weight_micro // s.wsum) AS quota
  FROM dm_w{T_ROUNDS} w CROSS JOIN v7_budget b CROSS JOIN v7_wsum s
),
v7_pos AS (
  SELECT s.doc_id, s.lang, s.rho_micro, s.soft_weight_nano, s.eff_score,
         ROW_NUMBER() OVER (
           PARTITION BY s.lang
           ORDER BY s.eff_score DESC, s.rho_micro DESC, s.doc_id ASC
         ) AS lang_pos,
         q.quota
  FROM v7_scored s JOIN v7_quota q ON s.lang = q.lang
)
SELECT p.doc_id, p.lang, p.rho_micro,
       CAST(p.soft_weight_nano AS BIGINT) AS soft_weight_nano,
       CAST(p.eff_score AS BIGINT) AS eff_score,
       CAST(p.lang_pos AS BIGINT) AS lang_pos,
       CAST(p.quota AS BIGINT) AS quota,
       g.psi_total, g.gate_action
FROM v7_pos p CROSS JOIN v7_gate g
WHERE p.lang_pos <= p.quota
"""


from star_schema_etl_airflow_spark.plans.ivfpq import mat_ctes as _mat  # noqa: E402

register(QuerySpec("curation_pipeline_v7", curation_pipeline_v7,
                   _mat(_v7_oracle()), tags=("llm", "PIPELINE")))
