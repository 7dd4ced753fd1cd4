"""Curriculum ordering over the ``documents`` corpus — emit the exact
training ORDER (easy → hard stages, deterministically shuffled within a
stage) that curriculum-learning data loaders consume (Bengio et al.,
"Curriculum Learning", ICML'09; applied to LM pretraining data ordering
in e.g. Li et al., "Curriculum Learning for LLMs", 2022).

Pipeline: score each document with the repo's deterministic difficulty
proxy (type-token ratio — the same TTR used by
``quality_percentile_gate``), cut each language into ``NUM_STAGES``
difficulty stages (NTILE over (ttr, doc_id) — exact, engine-independent
tie-break), then lay out a single global schedule: all stage-1 docs
first, each stage internally shuffled by a seeded content hash (so the
"shuffle" is reproducible), with ``global_step`` = docs scheduled before
this stage + the doc's within-stage shuffle rank.

Scale design (100 TB): the per-language NTILE is the exact-semantics
spec; at corpus scale the stage boundaries come from the two-pass
approx-percentile cut-point trick already shipped as
``quality_gate_approx`` (plans/llm_text.py) — thresholds are S×Q rows,
broadcast, and staging becomes a map-only comparison.  The within-stage
rank window partitions by (NUM_STAGES) coarse keys; its distributed form
is the per-partition-offset surrogate-key path (``operators/scd2.py``,
auto-switch above 64 MB) keyed by the same (hash, doc_id) order — the
window here is the differential spec for it.  The stage-offset join is
NUM_STAGES rows, broadcast.

Reference parity: beyond-reference (LLM-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    md5_long_spark,
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

NUM_STAGES = 4
SHUFFLE_SEED = "curriculum"
TTR_DECIMALS = 9

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duck("text")
# seeded reproducible shuffle key: hash of (seed || doc_id)
_SHUF_S = md5_long_spark(f"concat('{SHUFFLE_SEED}', cast(doc_id as string))")
_SHUF_D = md5_long_duck(f"'{SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)")


def staged_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, ttr, shuf, stage) — the TTR-staged, seeded-shuffle
    intermediate shared by the schedule query and the pipeline-v6
    composition."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.round(
            F.expr(f"size(array_distinct({_TOKS_S}))").cast("double")
            / F.expr(f"size({_TOKS_S})").cast("double"),
            TTR_DECIMALS,
        ).alias("ttr"),
        F.expr(_SHUF_S).alias("shuf"),
    )
    # easy → hard: low lexical diversity (repetitive text) first
    w_stage = Window.partitionBy("lang").orderBy(
        F.col("ttr").asc(), F.col("doc_id").asc()
    )
    return docs.withColumn("stage", F.ntile(NUM_STAGES).over(w_stage))


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = staged_documents(spark, sf_dir)
    w_rank = Window.partitionBy("stage").orderBy(
        F.col("shuf").asc(), F.col("doc_id").asc()
    )
    ranked = staged.withColumn("stage_rank", F.row_number().over(w_rank))
    # stage sizes → cumulative offsets: NUM_STAGES rows, broadcast
    sizes = ranked.groupBy("stage").agg(F.count(F.lit(1)).alias("stage_size"))
    w_off = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.withColumn(
        "stage_offset", F.coalesce(F.sum("stage_size").over(w_off), F.lit(0))
    )
    return (
        ranked.join(F.broadcast(offsets), "stage")
        .select(
            "doc_id",
            "lang",
            "ttr",
            F.col("stage").cast("int").alias("stage"),
            F.col("stage_size").cast("long").alias("stage_size"),
            (F.col("stage_offset") + F.col("stage_rank"))
            .cast("long")
            .alias("global_step"),
        )
    )


# scored + staged CTE pair — shared with the pipeline-v6 oracle
CURRICULUM_STAGED_CTES = f"""scored AS (
  SELECT doc_id, lang,
         ROUND(CAST(len(list_distinct({_TOKS_D})) AS DOUBLE)
               / CAST(len({_TOKS_D}) AS DOUBLE), {TTR_DECIMALS}) AS ttr,
         {_SHUF_D} AS shuf
  FROM documents
),
staged AS (
  SELECT doc_id, lang, ttr, shuf,
         NTILE({NUM_STAGES}) OVER (
           PARTITION BY lang ORDER BY ttr ASC, doc_id ASC) AS stage
  FROM scored
)"""

CURRICULUM_ORACLE = f"""
WITH {CURRICULUM_STAGED_CTES},
ranked AS (
  SELECT doc_id, lang, ttr, stage,
         ROW_NUMBER() OVER (
           PARTITION BY stage ORDER BY shuf ASC, doc_id ASC) AS stage_rank
  FROM staged
),
sizes AS (
  SELECT stage, COUNT(*) AS stage_size FROM ranked GROUP BY stage
),
offsets AS (
  SELECT stage, stage_size,
         COALESCE(SUM(stage_size) OVER (
           ORDER BY stage
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS stage_offset
  FROM sizes
)
SELECT r.doc_id, r.lang, r.ttr,
       CAST(r.stage AS INTEGER) AS stage,
       CAST(o.stage_size AS BIGINT) AS stage_size,
       CAST(o.stage_offset + r.stage_rank AS BIGINT) AS global_step
FROM ranked r JOIN offsets o USING (stage)
"""

register(QuerySpec("curriculum_order", curriculum_order, CURRICULUM_ORACLE,
                   tags=("llm", "curriculum")))


# --- approx-percentile staging: the measured scale path ---------------------
#
# The NTILE staging above is the exact-semantics spec but costs a
# per-language global sort.  The 100 TB path the module docstring
# promises: per-language cut points from percentile_approx (a
# lang × (NUM_STAGES−1) relation, broadcast), staging as a map-only
# comparison — one aggregation + one map over the corpus, no sort.
# The price is approximation at stage BOUNDARIES only; this query
# measures it (the ``approx_quantile_bound`` pattern: the comparison
# happens Spark-side, the oracle pins the exact columns and the
# boolean bound verdict — the sketch itself is engine-specific and
# never crosses engines).

PCTL_ACCURACY = 10_000
# measured stage agreement vs exact NTILE: overall 0.996/0.992/0.998
# (worst language 0.987/0.986/0.996) at sf0.001/0.01/0.1 —
# disagreement = ties + ntile remainder docs at stage boundaries; the
# gate fails if the approx path ever degrades past this floor
AGREE_FLOOR = 0.95


def curriculum_stage_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, agree_ok): per-language agreement of the
    approx-cutpoint staging with the exact NTILE staging, collapsed to
    the boolean ≥ ``AGREE_FLOOR`` verdict the oracle can check."""
    staged = staged_documents(spark, sf_dir)
    qs = [i / NUM_STAGES for i in range(1, NUM_STAGES)]
    cuts = staged.groupBy("lang").agg(
        F.percentile_approx("ttr", qs, PCTL_ACCURACY).alias("cuts")
    )
    both = staged.join(F.broadcast(cuts), "lang").withColumn(
        "stage_approx",
        (F.lit(1) + F.expr("size(filter(cuts, c -> ttr > c))")).cast("int"),
    )
    return (
        both.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("stage") == F.col("stage_approx")).cast("long")
            ).alias("n_agree"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            (
                F.col("n_agree").cast("double")
                / F.col("n_docs").cast("double")
                >= AGREE_FLOOR
            ).alias("agree_ok"),
        )
    )


CURRICULUM_AGREEMENT_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS agree_ok
FROM documents GROUP BY lang
"""

register(QuerySpec("curriculum_stage_agreement", curriculum_stage_agreement,
                   CURRICULUM_AGREEMENT_ORACLE, tags=("llm", "curriculum")))
