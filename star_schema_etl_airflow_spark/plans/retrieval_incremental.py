"""Incremental retrieval-index probe: score a delta ingest batch
against the AT-REST BM25 statistics and merge it into the standing
top-k lists — without re-scanning the corpus (round-12 verdict task 6,
the retrieval twin of ``dedup_incremental_minhash``).

A 100 TB retrieval deployment cannot recompute df/N/Σdl per ingest
batch: the daily delta is GBs against a corpus of TBs.  The standard
move (the "deferred statistics refresh" every incremental IR system
makes — stats drift is O(|delta|/|corpus|) and a periodic full rebuild
re-trues them) is to freeze the at-rest statistics and score new
documents with them:

- at-rest artifacts, materialized once per corpus version:
  (1) the query index ``bm25_query_index`` — per query term the scaled
      idf weight plus (n_docs, sum_dl); |q| rows, broadcastable;
  (2) the standing per-query top-k lists (k rows per query).
- per batch: tokenize the DELTA ONLY, broadcast-join the frozen index,
  union the delta scores into the standing top-k, re-rank, cut at k.

Exactness of the merge: at-rest documents outside the standing top-k
are each dominated by ≥ k at-rest documents whose scores the merge
retains unchanged, so they can never enter the merged top-k — the
k-deep list is sufficient state, not an approximation (under frozen
statistics).  The DuckDB oracle reproduces the same frozen-stats
semantics (at-rest CTEs via ``bm25_scored_ctes``, delta scored against
the at-rest ``qidf``), so the check is exact, not tolerance-based.

Scale design: the corpus participates ONLY through the two at-rest
artifacts (``persist_once`` stands in for their materialized tables,
exactly as in ``dedup_incremental_minhash``); the delta is the only
side tokenized and shuffled per batch, so per-batch cost is
delta-proportional and ~flat in corpus size — measured on the
corpus/delta axes by ``tools/retrieval_curve.py``.

Fixture delta convention mirrors ``kmv_incremental_merge``: even
doc_ids are the at-rest corpus, odd doc_ids are the delta batch.

Reference parity: beyond-reference (LLM-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.plans.bm25 import (
    IDF_SCALE,
    SCORE_DECIMALS,
    TOP_K,
    bm25_query_index,
    bm25_score_with_index,
    bm25_scored_ctes,
    _TOKS_D,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table


def _topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def bm25_delta_probe(
    delta: DataFrame, qidf: DataFrame, at_topk: DataFrame
) -> DataFrame:
    """The probe itself, factored for the two-axis scale curve
    (``tools/retrieval_curve.py`` feeds it independently-sized corpora
    and deltas): ``qidf`` and ``at_topk`` are the at-rest artifacts;
    only ``delta`` is tokenized."""
    delta_scores = bm25_score_with_index(delta, qidf)
    merged = at_topk.select("query_id", "doc_id", "score").unionByName(
        delta_scores
    )
    return _topk(merged).select(
        "query_id",
        "rank",
        "doc_id",
        F.col("score").cast("double").alias("score"),
    )


def retrieval_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    at_rest = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    # at-rest artifacts: the materialized outputs of the last full pass
    qidf = persist_once(bm25_query_index(spark, at_rest))
    at_topk = persist_once(
        _topk(bm25_score_with_index(at_rest, qidf))
        .select("query_id", "doc_id", "score")
    )
    probed = bm25_delta_probe(delta, qidf, at_topk)
    # provenance at the edge: which merged hits came from the delta
    return probed.withColumn("is_delta", F.col("doc_id") % 2 == 1)


RETRIEVAL_INCREMENTAL_ORACLE = f"""
WITH {bm25_scored_ctes("(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0)")},
at_topk AS (
  SELECT query_id, doc_id, score FROM (
    SELECT query_id, doc_id, score,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id ASC
           ) AS rn
    FROM scored
  ) WHERE rn <= {TOP_K}
),
dtoks AS (
  SELECT doc_id, unnest({_TOKS_D}) AS term
  FROM (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)
),
dtf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM dtoks GROUP BY 1, 2
),
ddl AS (
  SELECT doc_id, COUNT(*) AS dl FROM dtoks GROUP BY 1
),
dcontrib AS (
  SELECT i.query_id, t.doc_id,
         CAST(ROUND(
           (CAST(i.w AS DOUBLE) / {IDF_SCALE}.0)
           * (CAST(22 * t.tf * i.sum_dl AS DOUBLE)
              / CAST(10 * t.tf * i.sum_dl + 3 * i.sum_dl
                     + 9 * l.dl * i.n_docs AS DOUBLE)),
           {SCORE_DECIMALS}) AS DECIMAL(19,9)) AS c
  FROM dtf t
  JOIN qidf i ON t.term = i.term
  JOIN ddl l ON t.doc_id = l.doc_id
),
dscored AS (
  SELECT query_id, doc_id, CAST(SUM(c) AS DECIMAL(38,9)) AS score
  FROM dcontrib GROUP BY 1, 2
),
merged AS (
  SELECT query_id, doc_id, score FROM at_topk
  UNION ALL
  SELECT query_id, doc_id, score FROM dscored
),
final AS (
  SELECT query_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM merged
)
SELECT query_id, rank, doc_id, CAST(score AS DOUBLE) AS score,
       doc_id % 2 = 1 AS is_delta
FROM final WHERE rank <= {TOP_K}
"""

register(QuerySpec(
    "retrieval_incremental", retrieval_incremental,
    RETRIEVAL_INCREMENTAL_ORACLE, tags=("LLM-RETRIEVAL",),
))


# --- frozen-stats drift evaluation ------------------------------------------


def retrieval_drift_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure the ONE approximation the incremental path makes: the
    frozen at-rest statistics.  Per query, how much of the TRUE top-k
    (full corpus re-scored with true df/N/Σdl) does the frozen-stats
    merged list recover?  This turns the documented
    O(|delta|/|corpus|) stats-drift claim into a number the deployment
    can watch — when overlap decays, it is time for the periodic full
    rebuild the module docstring prescribes.

    Scale: the true side is the standard one-scan BM25 chain; the
    frozen side is the incremental merge (delta-sized); the comparison
    joins two queries×k lists — control-plane sized."""
    from star_schema_etl_airflow_spark.plans.bm25 import bm25_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    true_k = (
        bm25_scores(spark, docs)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "doc_id")
    )
    froz_k = retrieval_incremental(spark, sf_dir).select(
        "query_id", "doc_id"
    )
    ov = (
        true_k.join(froz_k, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        true_k.select("query_id").distinct()
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
            .alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
                / F.lit(float(TOP_K)),
                9,
            ).alias("overlap_frac"),
        )
    )


def _drift_eval_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.bm25 import bm25_scored_ctes

    inc_body = RETRIEVAL_INCREMENTAL_ORACLE.split(
        "\nSELECT query_id, rank"
    )[0]
    return f"""{inc_body},
{bm25_scored_ctes("documents", "_t")},
true_k AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id ASC
           ) AS rn
    FROM scored_t
  ) WHERE rn <= {TOP_K}
),
froz_k AS (
  SELECT query_id, doc_id FROM final WHERE rank <= {TOP_K}
),
ov AS (
  SELECT t.query_id, COUNT(*) AS n_overlap
  FROM true_k t JOIN froz_k f
    ON t.query_id = f.query_id AND t.doc_id = f.doc_id
  GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / {float(TOP_K)!r},
             9) AS overlap_frac
FROM (SELECT DISTINCT query_id FROM true_k) q
LEFT JOIN ov o ON o.query_id = q.query_id
"""


register(QuerySpec("retrieval_drift_eval", retrieval_drift_eval,
                   _drift_eval_oracle(), tags=("LLM-RETRIEVAL", "EVAL")))
