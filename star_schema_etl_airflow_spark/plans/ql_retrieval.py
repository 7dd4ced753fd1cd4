"""Dirichlet-smoothed query-likelihood retrieval + reciprocal-rank
fusion — the second classic lexical ranker (Ponte/Croft query-likelihood
with Zhai/Lafferty Dirichlet smoothing) and the standard way a curation
pipeline combines heterogeneous rankers (Cormack et al. RRF) into one
hybrid retrieval list.

Query likelihood (natural log, Dirichlet prior μ):

    score(q, d) = Σ_{t∈q} ln( (tf_td + μ·ctf_t/C) / (dl_d + μ) )

decomposed so only PRESENT (doc, term) pairs need the corpus-sized join
(the classic sparse decomposition — absent terms contribute through
per-doc/per-query closed forms):

    score = Σ_{t∈q∩d} ln( (μ·ctf_t + tf·C) / (μ·ctf_t) )   [w_hit]
          + Σ_{t∈q}   ln( ctf_t / C )                       [sum_bg]
          + |q|·ln(μ)                                       [W_MU]
          − |q|·ln(dl + μ)                                  [w_len]

Float determinism (the repo's cross-engine contract, plans/bm25.py):
every ln argument is a ratio of EXACT int64s, each ln is carried as
``round(1e6·ln(·))`` BIGINT (margin pinned corpus-wide in
``tests/test_ln_boundary_margin.py``), and the total is pure BIGINT
arithmetic — ranking compares exact integers.  ``ln(μ)`` is a
compile-time literal embedded identically in both engines.  Int64
headroom: ``tf·C`` caps at ~9.2e18/tf_max — with tf ≤ 1000 that is a
9-quadrillion-token corpus; beyond it, switch num/den to double AFTER
the exact construction (one rounding, still per-engine deterministic),
same fallback bm25 documents.  The bound is ENFORCED, not just
documented: ``ql_scores`` checks ``(μ + max_dl)·C < 2^63`` on the
one-row stats aggregate (``assert_true``, zero hot-path cost) so an
over-headroom corpus fails loudly instead of wrapping BIGINT silently
— Spark wraps where DuckDB widens to HUGEINT, so the wrap would
otherwise surface as a silent cross-engine divergence (round-12
advice).

RRF (k = 60): rrf(d) = Σ_r 1/(k + rank_r(d)) over each ranker's
top-FUSE_K list; each reciprocal is rounded to 9 decimals and summed in
DECIMAL, so fusion scores (and hence ranks) are exact on both engines.

Scale design (100 TB): the corpus is tokenized ONCE into the persisted
(doc, term) tf relation — the IDENTICAL plan bm25_scores persists, so
in the fused query the CacheManager substitutes one shared
InMemoryRelation for both rankers (functions/caching.py); dl and ctf
are re-aggregations of tf, never a second corpus scan.  The query-term
weight table (|q| rows) and per-query constants broadcast; the only
corpus-sized shuffles are the tf groupBy and the per-query top-k
windows, which Catalyst bounds map-side via partial WindowGroupLimit
(pinned for this shape in tests/test_plans.py).  Fusion joins two
FUSE_K-row-per-query lists — trivially broadcastable.

Reference parity: beyond-reference (LLM-pipeline extension; the
reference has no text retrieval).
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
from star_schema_etl_airflow_spark.functions.text import (
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duck("text")

MU = 300              # Dirichlet prior mass (≈ 3-10× mean fixture doc length)
LN_SCALE = 1_000_000  # scaled-int ln carrier (same decade as bm25's IDF_SCALE)
TOP_K = 10            # rows returned per query
FUSE_K = 30           # per-ranker list depth feeding the fusion
RRF_K = 60            # RRF damping constant (Cormack et al.'s k)
RRF_DECIMALS = 9

# ln(μ) as a literal so both engines use the identical integer — the only
# corpus-independent transcendental in the score.
W_MU = round(math.log(MU) * LN_SCALE)


def _w_ln_spark(num, den) -> F.Column:
    """round(LN_SCALE·ln(num/den)) as BIGINT — num/den are exact-int64
    columns; the single double division is IEEE-identical cross-engine."""
    return (
        F.round(
            F.log(num.cast("double") / den.cast("double"))
            * F.lit(float(LN_SCALE)),
            0,
        ).cast("long")
    )


def ql_scores(
    spark: SparkSession,
    docs: DataFrame,
    queries: tuple[tuple[int, tuple[str, ...]], ...] = BM25_QUERIES,
    int64_headroom: int = 2**63,
) -> DataFrame:
    """(query_id, doc_id, score_scaled BIGINT) over any (doc_id, text)
    corpus — candidates are docs matching ≥1 query term (the standard
    inverted-index retrieval set).  ``int64_headroom`` is the BIGINT
    wrap cliff the stats guard enforces (parameterized only so tests
    can trigger the guard on a fixture-sized corpus)."""
    toks = docs.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("term"))
    # identical construction to bm25_scores' tf → one shared cache entry
    tf = persist_once(
        toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # int64-headroom guard on the ONE-ROW stats aggregate: the w_hit
    # numerator μ·ctf + tf·C is bounded by (μ + max_dl)·C; past 2^63
    # Spark BIGINT wraps silently while DuckDB widens to HUGEINT, so an
    # over-headroom corpus must fail loudly here (the documented
    # double-carrier fallback is then adopted deliberately).  The bound
    # itself is compared in double — exactness is irrelevant 3 decades
    # under the cliff, and ``when(assert_true(...).isNull(), c_total)``
    # ties the check into the consumed column so Catalyst cannot prune
    # it away.
    stats = (
        dl.agg(F.sum("dl").alias("c_total"), F.max("dl").alias("max_dl"))
        .select(
            F.when(
                F.assert_true(
                    (F.lit(float(MU)) + F.col("max_dl").cast("double"))
                    * F.col("c_total").cast("double")
                    < F.lit(float(int64_headroom)),
                    F.concat(
                        F.lit(
                            "ql_scores int64 headroom exceeded: "
                            "(mu + max_dl) * c_total = "
                        ),
                        ((F.lit(float(MU)) + F.col("max_dl").cast("double"))
                         * F.col("c_total").cast("double")).cast("string"),
                        F.lit(
                            " >= 2^63 — switch the ln carrier to the "
                            "documented double fallback"
                        ),
                    ),
                ).isNull(),
                F.col("c_total"),
            ).alias("c_total")
        )
    )

    qrows = [(qid, term) for qid, terms in queries for term in terms]
    qterms = spark.createDataFrame(qrows, "query_id int, term string")
    # corpus frequency for query terms only: map-side-filtered re-agg of
    # tf, so the broadcastable weight table never exceeds |q| rows.
    # Terms absent from the corpus drop here (inner join) identically on
    # both engines — ln(0) never occurs.
    ctf = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
    )
    qct = qterms.join(ctf, "term").crossJoin(F.broadcast(stats))

    qconst = (
        qct.select(
            "query_id",
            _w_ln_spark(F.col("ctf"), F.col("c_total")).alias("w_bg"),
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_terms"), F.sum("w_bg").alias("sum_bg"))
    )

    hits = (
        tf.join(F.broadcast(qct), "term")
        .select(
            "query_id",
            "doc_id",
            _w_ln_spark(
                F.lit(MU) * F.col("ctf") + F.col("tf") * F.col("c_total"),
                F.lit(MU) * F.col("ctf"),
            ).alias("w"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("w_hit"))
    )

    w_len = F.round(
        F.log((F.col("dl") + F.lit(MU)).cast("double"))
        * F.lit(float(LN_SCALE)),
        0,
    ).cast("long")
    return (
        hits.join(dl, "doc_id")
        .join(F.broadcast(qconst), "query_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("w_hit")
                + F.col("sum_bg")
                + F.col("n_terms") * (F.lit(W_MU) - w_len)
            ).alias("score_scaled"),
        )
    )


def retrieval_ql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = ql_scores(spark, docs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_scaled").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        # exact-int internal, double at the edge (repo convention)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (F.col("score_scaled").cast("double") / F.lit(float(LN_SCALE)))
            .alias("score"),
        )
    )


_QUERY_VALUES = ", ".join(
    f"({qid}, '{term}')" for qid, terms in BM25_QUERIES for term in terms
)


def ql_scored_ctes(corpus: str) -> str:
    """CTE chain computing ``ql_scored(query_id, doc_id, score_scaled)``
    — the oracle twin of :func:`ql_scores` (same exact-int arithmetic).
    All names are ``ql_``-prefixed so the chain composes with
    ``bm25_scored_ctes`` in one WITH clause."""
    w_hit = (
        f"CAST(ROUND(LN(CAST({MU} * i.ctf + t.tf * i.c_total AS DOUBLE)"
        f" / CAST({MU} * i.ctf AS DOUBLE)) * {LN_SCALE}.0, 0) AS BIGINT)"
    )
    return f"""
ql_toks AS (
  SELECT doc_id, unnest({_TOKS_D}) AS term FROM {corpus}
),
ql_tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM ql_toks GROUP BY 1, 2
),
ql_dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM ql_tf GROUP BY 1
),
ql_stats AS (
  SELECT SUM(dl) AS c_total FROM ql_dl
),
ql_q(query_id, term) AS (VALUES {_QUERY_VALUES}),
ql_ctf AS (
  SELECT term, SUM(tf) AS ctf FROM ql_tf
  WHERE term IN (SELECT term FROM ql_q) GROUP BY 1
),
ql_qct AS (
  SELECT q.query_id, q.term, c.ctf, s.c_total
  FROM ql_q q JOIN ql_ctf c ON q.term = c.term CROSS JOIN ql_stats s
),
ql_qconst AS (
  SELECT query_id, COUNT(*) AS n_terms,
         SUM(CAST(ROUND(LN(CAST(ctf AS DOUBLE) / CAST(c_total AS DOUBLE))
                        * {LN_SCALE}.0, 0) AS BIGINT)) AS sum_bg
  FROM ql_qct GROUP BY 1
),
ql_hits AS (
  SELECT i.query_id, t.doc_id, SUM({w_hit}) AS w_hit
  FROM ql_tf t JOIN ql_qct i ON t.term = i.term GROUP BY 1, 2
),
ql_scored AS (
  SELECT h.query_id, h.doc_id,
         h.w_hit + c.sum_bg + c.n_terms *
           ({W_MU} - CAST(ROUND(LN(CAST(l.dl + {MU} AS DOUBLE))
                                * {LN_SCALE}.0, 0) AS BIGINT))
           AS score_scaled
  FROM ql_hits h
  JOIN ql_dl l ON h.doc_id = l.doc_id
  JOIN ql_qconst c ON h.query_id = c.query_id
)"""


QL_ORACLE = f"""
WITH {ql_scored_ctes("documents")},
ranked AS (
  SELECT query_id, doc_id, score_scaled,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score_scaled DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM ql_scored
)
SELECT query_id, rank, doc_id,
       CAST(score_scaled AS DOUBLE) / {LN_SCALE}.0 AS score
FROM ranked WHERE rank <= {TOP_K}
"""


# --- reciprocal-rank fusion -------------------------------------------------


def _rrf_contrib(rank_col: str) -> F.Column:
    """round(1/(RRF_K + rank), 9) as exact DECIMAL; 0 when the ranker
    did not retrieve the doc.  Boundary margin of every realized
    reciprocal is pinned in tests/test_ql_retrieval.py."""
    return F.coalesce(
        F.round(F.lit(1.0) / (F.lit(RRF_K) + F.col(rank_col)), RRF_DECIMALS)
        .cast("decimal(12,9)"),
        F.lit(0).cast("decimal(12,9)"),
    )


def retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wb = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    b = (
        bm25_scores(spark, docs)
        .withColumn("bm25_rank", F.row_number().over(wb))
        .filter(F.col("bm25_rank") <= FUSE_K)
        .select("query_id", "doc_id", "bm25_rank")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score_scaled").desc(), F.col("doc_id").asc()
    )
    q = (
        ql_scores(spark, docs)
        .withColumn("ql_rank", F.row_number().over(wq))
        .filter(F.col("ql_rank") <= FUSE_K)
        .select("query_id", "doc_id", "ql_rank")
    )
    fused = b.join(q, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf",
        (_rrf_contrib("bm25_rank") + _rrf_contrib("ql_rank"))
        .cast("decimal(13,9)"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.col("rrf").cast("double").alias("rrf_score"),
            "bm25_rank",
            "ql_rank",
        )
    )


_RRF_C = (
    f"CAST(ROUND(1.0 / ({RRF_K} + {{r}}), {RRF_DECIMALS}) AS DECIMAL(12,9))"
)

RRF_ORACLE = f"""
WITH {bm25_scored_ctes("documents")},
bm25_ranked AS (
  SELECT query_id, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS bm25_rank
  FROM scored
  QUALIFY bm25_rank <= {FUSE_K}
),
{ql_scored_ctes("documents").lstrip()},
ql_ranked AS (
  SELECT query_id, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score_scaled DESC, doc_id ASC
         ) AS INTEGER) AS ql_rank
  FROM ql_scored
  QUALIFY ql_rank <= {FUSE_K}
),
fused AS (
  SELECT COALESCE(b.query_id, q.query_id) AS query_id,
         COALESCE(b.doc_id, q.doc_id) AS doc_id,
         b.bm25_rank, q.ql_rank,
         CAST(COALESCE({_RRF_C.format(r="b.bm25_rank")},
                       CAST(0 AS DECIMAL(12,9)))
              + COALESCE({_RRF_C.format(r="q.ql_rank")},
                         CAST(0 AS DECIMAL(12,9)))
              AS DECIMAL(13,9)) AS rrf
  FROM bm25_ranked b
  FULL JOIN ql_ranked q
    ON b.query_id = q.query_id AND b.doc_id = q.doc_id
),
final_ranked AS (
  SELECT query_id, doc_id, rrf, bm25_rank, ql_rank,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM fused
)
SELECT query_id, rank, doc_id, CAST(rrf AS DOUBLE) AS rrf_score,
       bm25_rank, ql_rank
FROM final_ranked WHERE rank <= {TOP_K}
"""

register(QuerySpec("retrieval_ql_topk", retrieval_ql_topk, QL_ORACLE,
                   tags=("LLM-RETRIEVAL",)))
register(QuerySpec("retrieval_rrf", retrieval_rrf, RRF_ORACLE,
                   tags=("LLM-RETRIEVAL",)))
