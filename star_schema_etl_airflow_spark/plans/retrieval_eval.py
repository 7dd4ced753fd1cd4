"""Retrieval evaluation as a query: nDCG@10 and recall@10 for each
ranker (BM25, query likelihood, RRF fusion) against a deterministic
relevance rule — the eval loop a curation pipeline runs to decide WHICH
retriever mines its training subsets, expressed as the same kind of
oracle-checked DataFrame as everything else.

Relevance rule: a document is relevant to a query iff it contains ≥
``REL_MIN_TERMS`` distinct query terms (exact, engine-independent —
graded judgments would slot into the same shape as a rel column > 1).

Float determinism: the only transcendental in nDCG is log2 in the rank
discount, and ranks are bounded by the cutoff — so the discounts
1/log2(r+1) for r = 1..10 (and the ideal-DCG prefix sums) are
PRECOMPUTED IN PYTHON and injected as exact DECIMAL literals into both
engines.  No ln/log evaluates inside either engine; DCG is an exact
DECIMAL dot product, and the final nDCG division is one double op on
identical operands.

Scale design: relevance needs one corpus-sized stage — the (doc, term)
tf relation joined to the broadcast query-term list (the IDENTICAL
cached tf both scorers share, functions/caching.py) — aggregated to
per-(query, doc) matched-term counts.  Ranked lists are cutoff-bounded
(3 rankers × |q| × 10 rows); everything downstream of the corpus scan
is list-sized.

Reference parity: beyond-reference (LLM-pipeline extension).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.plans.bm25 import (
    BM25_QUERIES,
    bm25_scored_ctes,
    bm25_scores,
)
from star_schema_etl_airflow_spark.plans.ql_retrieval import (
    FUSE_K,
    RRF_DECIMALS,
    RRF_K,
    ql_scored_ctes,
    ql_scores,
    retrieval_rrf,
)
from star_schema_etl_airflow_spark.functions.text import (
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duck("text")

CUTOFF = 10
REL_MIN_TERMS = 2
DISC_DECIMALS = 9

# The rrf eval row reuses retrieval_rrf's TOP_K-deep output while the
# oracle rebuilds the fused list from FUSE_K-deep inputs cut at CUTOFF;
# if TOP_K ever dropped below CUTOFF the Spark side would silently
# under-cover rrf ranks and the engines would diverge (round-12 advice).
from star_schema_etl_airflow_spark.plans.ql_retrieval import TOP_K as _QL_TOP_K

if _QL_TOP_K < CUTOFF:
    raise ImportError(
        f"retrieval_eval requires ql_retrieval.TOP_K ({_QL_TOP_K}) >= "
        f"CUTOFF ({CUTOFF}): the rrf eval list is only TOP_K deep"
    )

# exact literal discounts: disc[r] = round(1/log2(r+1), 9)
DISCOUNTS = {
    r: round(1.0 / math.log2(r + 1), DISC_DECIMALS)
    for r in range(1, CUTOFF + 1)
}
# ideal-DCG prefix sums: idcg[n] = Σ_{r≤min(n, CUTOFF)} disc[r], as an
# exact decimal string (sum of 9-decimal terms is exact at 9 decimals)
_IDCG = {0: 0.0}
for _r in range(1, CUTOFF + 1):
    _IDCG[_r] = round(_IDCG[_r - 1] + DISCOUNTS[_r], DISC_DECIMALS)

_QUERY_VALUES = ", ".join(
    f"({qid}, '{term}')" for qid, terms in BM25_QUERIES for term in terms
)
_DISC_VALUES = ", ".join(
    f"({r}, CAST({DISCOUNTS[r]:.9f} AS DECIMAL(12,9)))"
    for r in range(1, CUTOFF + 1)
)
_IDCG_VALUES = ", ".join(
    f"({n}, CAST({_IDCG[n]:.9f} AS DECIMAL(13,9)))"
    for n in range(0, CUTOFF + 1)
)


def _relevance(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(query_id, doc_id) relevant pairs under the ≥REL_MIN_TERMS rule."""
    toks = docs.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("term"))
    tf = persist_once(
        toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    qrows = [(qid, t) for qid, ts in BM25_QUERIES for t in ts]
    qterms = spark.createDataFrame(qrows, "query_id int, term string")
    return (
        tf.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("n_terms"))
        .filter(F.col("n_terms") >= REL_MIN_TERMS)
        .select("query_id", "doc_id")
    )


def _ranked_lists(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(ranker, query_id, doc_id, rank ≤ CUTOFF) for all three rankers."""
    wb = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    bm25 = (
        bm25_scores(spark, docs)
        .withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= CUTOFF)
        .select(F.lit("bm25").alias("ranker"), "query_id", "doc_id", "rank")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score_scaled").desc(), F.col("doc_id").asc()
    )
    ql = (
        ql_scores(spark, docs)
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= CUTOFF)
        .select(F.lit("ql").alias("ranker"), "query_id", "doc_id", "rank")
    )
    return bm25.unionByName(ql)


def retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rel = persist_once(_relevance(spark, docs))

    rrf = retrieval_rrf(spark, sf_dir).select(
        F.lit("rrf").alias("ranker"), "query_id", "doc_id", "rank"
    )
    ranked = _ranked_lists(spark, docs).unionByName(rrf)

    disc = spark.createDataFrame(
        [(r, f"{DISCOUNTS[r]:.9f}") for r in range(1, CUTOFF + 1)],
        "rank int, disc string",
    ).select("rank", F.col("disc").cast("decimal(12,9)").alias("disc"))
    idcg = spark.createDataFrame(
        [(n, f"{_IDCG[n]:.9f}") for n in range(0, CUTOFF + 1)],
        "n int, idcg string",
    ).select("n", F.col("idcg").cast("decimal(13,9)").alias("idcg"))

    n_rel = rel.groupBy("query_id").agg(F.count("*").alias("n_relevant"))

    hits = (
        ranked.join(
            rel.withColumn("is_rel", F.lit(1)), ["query_id", "doc_id"], "left"
        )
        .join(F.broadcast(disc), "rank")
        .groupBy("ranker", "query_id")
        .agg(
            F.sum(
                F.when(F.col("is_rel") == 1, F.col("disc")).otherwise(
                    F.lit(0).cast("decimal(12,9)")
                )
            )
            .cast("decimal(14,9)")
            .alias("dcg"),
            F.sum(F.coalesce(F.col("is_rel"), F.lit(0))).alias("hits"),
        )
    )
    return (
        hits.join(F.broadcast(n_rel), "query_id")
        .join(
            F.broadcast(idcg),
            F.least(F.col("n_relevant"), F.lit(CUTOFF)) == F.col("n"),
        )
        .select(
            "ranker",
            "query_id",
            F.col("hits").cast("long").alias("hits_at_10"),
            F.col("n_relevant").cast("long").alias("n_relevant"),
            F.round(
                F.col("hits").cast("double")
                / F.col("n_relevant").cast("double"),
                DISC_DECIMALS,
            ).alias("recall_at_10"),
            F.round(
                F.col("dcg").cast("double") / F.col("idcg").cast("double"),
                DISC_DECIMALS,
            ).alias("ndcg_at_10"),
        )
    )


EVAL_ORACLE = f"""
WITH {bm25_scored_ctes("documents")},
{ql_scored_ctes("documents").lstrip()},
bm25_ranked AS (
  SELECT 'bm25' AS ranker, query_id, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored QUALIFY rank <= {CUTOFF}
),
ql_ranked AS (
  SELECT 'ql' AS ranker, query_id, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score_scaled DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM ql_scored QUALIFY rank <= {CUTOFF}
),
-- RRF fusion over the two top-30 lists (mirrors plans/ql_retrieval.py)
bm25_f AS (
  SELECT query_id, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS bm25_rank
  FROM scored QUALIFY bm25_rank <= {FUSE_K}
),
ql_f AS (
  SELECT query_id, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score_scaled DESC, doc_id ASC
         ) AS INTEGER) AS ql_rank
  FROM ql_scored QUALIFY ql_rank <= {FUSE_K}
),
fused AS (
  SELECT COALESCE(b.query_id, q.query_id) AS query_id,
         COALESCE(b.doc_id, q.doc_id) AS doc_id,
         CAST(COALESCE(CAST(ROUND(1.0 / ({RRF_K} + b.bm25_rank),
                                  {RRF_DECIMALS}) AS DECIMAL(12,9)),
                       CAST(0 AS DECIMAL(12,9)))
              + COALESCE(CAST(ROUND(1.0 / ({RRF_K} + q.ql_rank),
                                    {RRF_DECIMALS}) AS DECIMAL(12,9)),
                         CAST(0 AS DECIMAL(12,9)))
              AS DECIMAL(13,9)) AS rrf
  FROM bm25_f b FULL JOIN ql_f q
    ON b.query_id = q.query_id AND b.doc_id = q.doc_id
),
rrf_ranked AS (
  SELECT 'rrf' AS ranker, query_id, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM fused QUALIFY rank <= {CUTOFF}
),
ranked AS (
  SELECT * FROM bm25_ranked
  UNION ALL SELECT * FROM ql_ranked
  UNION ALL SELECT * FROM rrf_ranked
),
eval_q(query_id, term) AS (VALUES {_QUERY_VALUES}),
rel AS (
  SELECT t.query_id, t.doc_id FROM (
    SELECT q.query_id, f.doc_id, COUNT(*) AS n_terms
    FROM tf f JOIN eval_q q ON f.term = q.term
    GROUP BY 1, 2
  ) t WHERE t.n_terms >= {REL_MIN_TERMS}
),
n_rel AS (
  SELECT query_id, COUNT(*) AS n_relevant FROM rel GROUP BY 1
),
disc(rank, disc) AS (VALUES {_DISC_VALUES}),
idcg(n, idcg) AS (VALUES {_IDCG_VALUES}),
hits AS (
  SELECT r.ranker, r.query_id,
         CAST(SUM(CASE WHEN rel.doc_id IS NOT NULL THEN d.disc
                       ELSE CAST(0 AS DECIMAL(12,9)) END)
              AS DECIMAL(14,9)) AS dcg,
         SUM(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS hits
  FROM ranked r
  JOIN disc d ON r.rank = d.rank
  LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
  GROUP BY 1, 2
)
SELECT h.ranker, h.query_id,
       CAST(h.hits AS BIGINT) AS hits_at_10,
       CAST(n.n_relevant AS BIGINT) AS n_relevant,
       ROUND(CAST(h.hits AS DOUBLE) / CAST(n.n_relevant AS DOUBLE),
             {DISC_DECIMALS}) AS recall_at_10,
       ROUND(CAST(h.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE),
             {DISC_DECIMALS}) AS ndcg_at_10
FROM hits h
JOIN n_rel n ON h.query_id = n.query_id
JOIN idcg i ON i.n = LEAST(n.n_relevant, {CUTOFF})
"""

register(QuerySpec("retrieval_eval", retrieval_eval, EVAL_ORACLE,
                   tags=("LLM-RETRIEVAL", "EVAL")))
