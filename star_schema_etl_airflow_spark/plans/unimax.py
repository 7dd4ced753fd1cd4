"""UniMax language balancing — budgeted water-filling over languages.

Multilingual corpora are power-law skewed; sampling proportionally
starves tail languages and sampling uniformly over-epochs them.  UniMax
(Chung et al., "UniMax: Fairer and More Effective Language Sampling for
Large-Scale Multilingual Pretraining", ICLR 2023) allocates a global
document budget as uniformly as possible across languages subject to a
per-language epoch cap: every language receives
``min(cap_l, λ)`` documents, where the water level λ exhausts the
budget.

Exact integer formulation (no floats anywhere — the allocation is
bit-identical across engines by construction):

- caps sorted ascending; a language is *funded* (gets its full cap) iff
  ``cap_i · R_i + P_i ≤ B`` where ``P_i`` is the prefix cap sum before
  it and ``R_i`` the number of languages from it on — the classic
  water-filling feasibility test restated multiplication-only.
- ascending caps make funded a prefix property, so the shared water
  level for every unfunded language is one integer division:
  ``λ = (B − Σ_funded cap) DIV (n_langs − n_funded)``.

``unimax_allocation`` emits the per-language plan; ``unimax_sample``
materializes it — exactly ``alloc_l`` documents per language, chosen by
md5-hash order (deterministic, reproducible, engine-identical).

Scale design (100 TB): the allocation runs on the per-language count
table (|languages| rows — control-plane sized, broadcast back).  The
sample is one hash-ranked window per language; at corpus scale the
per-language rank is the same two-pass range-partitioned rank the
surrogate-key operator auto-promotes to (``operators/scd2.py``), and
the hash order means any prefix of the rank is an unbiased sample.

Reference parity: beyond-reference (LLM-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    md5_long_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

EPOCH_CAP = 1          # C: max epochs of any language (cap_l = C·n_l)
BUDGET_NUM, BUDGET_DEN = 2, 5   # B = floor(2/5 · corpus)
SAMPLE_SEED = "unimax"


def waterfill_allocation(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, cap_docs, funded, alloc_docs) over ANY
    (doc_id, lang) relation — the corpus-parametric water-filling core
    shared by ``unimax_allocation`` and the composed pipelines."""
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    caps = counts.withColumn("cap_docs", F.col("n_docs") * EPOCH_CAP)

    w = Window.orderBy("cap_docs", "lang")
    stats = caps.select(
        "lang", "n_docs", "cap_docs",
        (F.sum("cap_docs").over(w) - F.col("cap_docs")).alias("prefix"),
        F.row_number().over(w).alias("i"),
    )
    tot = caps.agg(
        F.count("*").alias("n_langs"),
        ((F.sum("cap_docs") * BUDGET_NUM)
         .cast("long")
         .alias("budget_times_den")),
    ).select(
        "n_langs",
        F.expr(f"budget_times_den div {BUDGET_DEN}").alias("budget"),
    )
    # |languages| rows: the windows above are control-plane sized; the
    # totals row is a broadcast scalar
    flagged = stats.crossJoin(F.broadcast(tot)).withColumn(
        "funded",
        (F.col("cap_docs") * (F.col("n_langs") - F.col("i") + 1)
         + F.col("prefix")) <= F.col("budget"),
    )
    lam = flagged.agg(
        F.max("budget").alias("b"),
        F.max("n_langs").alias("nl"),
        F.sum(F.when(F.col("funded"), F.col("cap_docs")).otherwise(0))
        .alias("funded_cap"),
        F.sum(F.when(F.col("funded"), 1).otherwise(0)).alias("n_funded"),
    ).select(
        F.expr(
            "case when nl = n_funded then null "
            "else (b - funded_cap) div (nl - n_funded) end"
        ).alias("water_level")
    )
    return (
        flagged.crossJoin(F.broadcast(lam))
        .select(
            "lang", "n_docs", "cap_docs",
            F.col("funded").cast("int").alias("funded"),
            F.when(F.col("funded"), F.col("cap_docs"))
            .otherwise(F.col("water_level"))
            .alias("alloc_docs"),
        )
    )


def unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, cap_docs, funded, alloc_docs) — the water-filled
    per-language budget over the documents table."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return waterfill_allocation(docs)


def unimax_alloc_ctes(rel: str = "documents") -> str:
    """CTE chain computing ``alloc(lang, …, alloc_docs)`` over any
    ``(doc_id, lang)`` relation — the oracle twin of
    :func:`waterfill_allocation`."""
    return UNIMAX_ALLOC_CTE_TEMPLATE.format(rel=rel)


UNIMAX_ALLOC_CTE_TEMPLATE = f"""
um_counts AS (
  SELECT lang, COUNT(*) AS n_docs FROM {{rel}} GROUP BY lang
),
um_caps AS (
  SELECT lang, n_docs, n_docs * {EPOCH_CAP} AS cap_docs FROM um_counts
),
um_stats AS (
  SELECT lang, n_docs, cap_docs,
         SUM(cap_docs) OVER (ORDER BY cap_docs, lang) - cap_docs AS prefix,
         ROW_NUMBER() OVER (ORDER BY cap_docs, lang) AS i
  FROM um_caps
),
um_tot AS (
  SELECT COUNT(*) AS n_langs,
         (SUM(cap_docs) * {BUDGET_NUM}) // {BUDGET_DEN} AS budget
  FROM um_caps
),
um_flagged AS (
  SELECT s.*, t.n_langs, t.budget,
         (s.cap_docs * (t.n_langs - s.i + 1) + s.prefix) <= t.budget
           AS funded
  FROM um_stats s, um_tot t
),
um_lam AS (
  SELECT CASE WHEN MAX(n_langs) = SUM(CASE WHEN funded THEN 1 ELSE 0 END)
              THEN NULL
              ELSE (MAX(budget)
                    - SUM(CASE WHEN funded THEN cap_docs ELSE 0 END))
                   // (MAX(n_langs)
                       - SUM(CASE WHEN funded THEN 1 ELSE 0 END))
         END AS water_level
  FROM um_flagged
),
alloc AS (
  SELECT f.lang, f.n_docs, f.cap_docs,
         CAST(f.funded AS INTEGER) AS funded,
         -- CAST: water_level derives from SUM(BIGINT) which DuckDB widens
         -- to HUGEINT (pandas float64); Spark stays int64 — cast back.
         CAST(CASE WHEN f.funded THEN f.cap_docs ELSE l.water_level END
              AS BIGINT) AS alloc_docs
  FROM um_flagged f, um_lam l
)
"""

UNIMAX_ALLOC_ORACLE = f"""
WITH {unimax_alloc_ctes()}
SELECT * FROM alloc
"""


def unimax_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly ``alloc_docs`` documents per language, in md5-hash order
    (an unbiased, reproducible prefix of each language's corpus)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    alloc = unimax_allocation(spark, sf_dir).select("lang", "alloc_docs")
    key = F.expr(md5_long_spark("cast(doc_id as string)", SAMPLE_SEED))
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id"))
    return (
        docs.join(F.broadcast(alloc), "lang")
        .withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= F.col("alloc_docs"))
        .select("doc_id", "lang", "samp_rank")
    )


UNIMAX_SAMPLE_ORACLE = f"""
WITH {unimax_alloc_ctes()},
ranked AS (
  SELECT d.doc_id, d.lang,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY d.lang
           ORDER BY ({md5_long_duck('CAST(d.doc_id AS VARCHAR)',
                                    SAMPLE_SEED)}), d.doc_id
         ) AS INTEGER) AS samp_rank,
         a.alloc_docs
  FROM documents d JOIN alloc a ON d.lang = a.lang
)
SELECT doc_id, lang, samp_rank FROM ranked WHERE samp_rank <= alloc_docs
"""


register(QuerySpec("unimax_allocation", unimax_allocation,
                   UNIMAX_ALLOC_ORACLE, tags=("llm", "curation")))
register(QuerySpec("unimax_sample", unimax_sample,
                   UNIMAX_SAMPLE_ORACLE, tags=("llm", "curation")))
