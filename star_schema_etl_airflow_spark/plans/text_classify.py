"""Distributed text classification and sparse-vector similarity over the
``documents`` fixture: a multinomial Naive Bayes classifier (train +
predict, closed-form) and an idf-weighted sparse cosine similarity join
over an inverted shingle index.

These are the two model-driven curation tools a training-data pipeline
runs after the hash/sketch dedup passes:

- ``nb_classify`` — the fastText-style *quality/domain classifier* slot.
  Multinomial NB is the one classifier whose training is closed-form
  (count aggregations), so train AND predict are pure DataFrame plans,
  fully differential-checkable — no iterative solver, no driver loop.
  The fixture's ``lang`` labels are synthetic (accuracy is not the
  point); the machinery — smoothed log-likelihood table, broadcast
  scoring join, exact-decimal log-prob sums, deterministic argmax — is
  exactly what a real quality classifier deploys at scale.
- ``tfidf_topk_pairs`` — sparse near-dup similarity WITHOUT embeddings:
  documents as idf-weighted shingle sets, cosine computed through an
  inverted-index join so only pairs sharing a rare-enough shingle are
  ever scored (posting lists capped at ``DF_CAP`` — the prefix-filter
  trick; frequent shingles carry ~no idf weight anyway).

Float determinism: ``ln`` differs between engines in the last ulp, so
every log value is rounded to 9 decimals at the source; all sums over
those values run in DECIMAL (order-independent), and doubles reappear
only for single non-associative ops (one division, one sqrt) — the same
contract as the cosine/money arithmetic elsewhere in the repo.

Scale design (100 TB):
- NB training is two groupBys (token×class, class totals); the model —
  V×C smoothed log-likelihoods — broadcasts (a 1M-token vocab × 10
  classes ≈ tens of MB); scoring is then map-side: explode tokens, hash
  join against the broadcast model, re-aggregate per (doc, class) with
  map-side combine, argmax per doc via an aggregatable min(struct).
- the similarity join's pair volume is Σ_t df_t² over the capped index,
  bounded by DF_CAP · Σ df_t — linear in corpus size with a constant
  knob, never quadratic; each posting list is an independent unit so
  skew is capped at DF_CAP² pairs per shingle.

Reference parity: beyond-reference (builder's LLM-pipeline extension
brief; the reference has no text processing at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    shingles_duck,
    shingles_spark,
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.functions.caching import persist_once

LOG_DECIMALS = 9

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duck("text")

# --- multinomial Naive Bayes ------------------------------------------------


def nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial NB ``lang`` classifier on the corpus and score
    every document (add-one smoothing).  All aggregations are closed-form
    counts; the model table broadcasts into a map-side scoring join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.expr(_TOKS_S)).alias("token")
    )
    # one corpus-wide aggregation: (token, lang) counts.  Every other
    # training statistic (per-class token totals, vocabulary size, the
    # token grid) re-aggregates this V×C-sized partial instead of
    # re-scanning the exploded corpus — training is ONE pass over the
    # 100 TB side, so persist the partial for its four consumers.
    tok_class = (
        persist_once(toks.groupBy("token", "lang").agg(F.count("*").alias("k")))
    )
    class_tok = tok_class.groupBy("lang").agg(F.sum("k").alias("n_tok"))
    class_docs = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    vocab = tok_class.select("token").distinct().agg(
        F.count("*").alias("v")
    )
    n_all = docs.agg(F.count("*").alias("n_all"))

    # smoothed log-likelihood over the full token × class grid (absent
    # pairs get the k=0 smoothed value) — this IS the model; broadcast it.
    grid = (
        tok_class.select("token").distinct()
        .crossJoin(F.broadcast(class_tok))
        .crossJoin(F.broadcast(vocab))
    )
    lik = grid.join(tok_class, ["token", "lang"], "left").select(
        "token",
        "lang",
        F.round(
            F.log(
                (F.coalesce("k", F.lit(0)) + 1)
                / (F.col("n_tok") + F.col("v")).cast("double")
            ),
            LOG_DECIMALS,
        ).alias("l"),
    )
    prior = class_docs.crossJoin(F.broadcast(n_all)).select(
        "lang",
        F.round(
            F.log(F.col("n_docs").cast("double") / F.col("n_all").cast("double")),
            LOG_DECIMALS,
        ).alias("p"),
    )
    scores = (
        toks.select("doc_id", "token")
        .join(F.broadcast(lik), "token")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("l").cast("decimal(19,9)")).alias("s"))
        .join(F.broadcast(prior), "lang")
        .select(
            "doc_id", "lang",
            (F.col("s") + F.col("p").cast("decimal(19,9)")).alias("score"),
        )
    )
    # argmax per doc, ties → lowest lang: aggregatable min(struct(-score, lang))
    return (
        scores.groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("score")).alias("ns"), "lang")).alias("best"))
        .select(
            "doc_id",
            F.col("best.lang").alias("predicted_lang"),
            (-F.col("best.ns")).cast("double").alias("score"),
        )
    )


NB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({_TOKS_D}) AS token FROM documents
),
class_tok AS (SELECT lang, COUNT(*) AS n_tok FROM toks GROUP BY 1),
class_docs AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
voc AS (SELECT COUNT(DISTINCT token) AS v FROM toks),
n_all AS (SELECT COUNT(*) AS n_all FROM documents),
tok_class AS (SELECT token, lang, COUNT(*) AS k FROM toks GROUP BY 1, 2),
grid AS (
  SELECT t.token, c.lang, c.n_tok, voc.v
  FROM (SELECT DISTINCT token FROM toks) t CROSS JOIN class_tok c CROSS JOIN voc
),
lik AS (
  SELECT g.token, g.lang,
         ROUND(LN((COALESCE(tc.k, 0) + 1)
                  / CAST(g.n_tok + g.v AS DOUBLE)), {LOG_DECIMALS}) AS l
  FROM grid g LEFT JOIN tok_class tc
    ON g.token = tc.token AND g.lang = tc.lang
),
pri AS (
  SELECT cd.lang,
         ROUND(LN(CAST(cd.n_docs AS DOUBLE) / CAST(n_all.n_all AS DOUBLE)),
               {LOG_DECIMALS}) AS p
  FROM class_docs cd CROSS JOIN n_all
),
sc AS (
  SELECT t.doc_id, l.lang, SUM(CAST(l.l AS DECIMAL(19,9))) AS s
  FROM toks t JOIN lik l ON t.token = l.token
  GROUP BY 1, 2
),
scored AS (
  SELECT sc.doc_id, sc.lang, sc.s + CAST(p.p AS DECIMAL(19,9)) AS score
  FROM sc JOIN pri p ON sc.lang = p.lang
)
SELECT doc_id, lang AS predicted_lang, CAST(score AS DOUBLE) AS score
FROM (
  SELECT doc_id, lang, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM scored
) WHERE rn = 1
"""

# --- idf-weighted sparse cosine via inverted index --------------------------

DF_CAP = 50          # max posting-list length kept in the index
TFIDF_COS_THRESHOLD = 0.5
IDF_SCALE = 1_000_000  # idf carried as round(ln·1e6) long — see tfidf_topk_pairs

_SH_S = shingles_spark(_TOKS_S)
_SH_D = shingles_duck(_TOKS_D)


def tfidf_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by idf-weighted shingle-set cosine, computed
    through an inverted index: only documents sharing a ≤DF_CAP-frequent
    shingle are ever paired.  Runs over the dup-augmented corpus of
    ``plans/llm_dedup.py`` so the differential check sees real positives."""
    from star_schema_etl_airflow_spark.plans.llm_dedup import build_corpus

    corpus = build_corpus(spark, sf_dir)
    postings = corpus.select(
        "doc_id", F.explode(F.expr(_SH_S)).alias("term")
    )
    n_docs = corpus.agg(F.countDistinct("doc_id").alias("n"))
    # idf as a scaled long (×1e6): the pair-join hot loop then runs pure
    # codegen long multiply-adds — exact and order-independent like
    # DECIMAL, but ~10× faster than BigDecimal(38,18) arithmetic.
    # Overflow headroom: a dot accumulates (idf·1e6)² ≤ (ln(N)·1e6)² per
    # shared term — >10⁴ shared terms fit under 2^62 at a 1e9-doc corpus
    # and >5×10³ even at 1e12 docs, far above any document's shingle
    # count here; chunking (chunk_documents) bounds it for pathological
    # docs.  tests/test_round4.py pins the arithmetic.
    idf = (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.round(
                F.log(F.col("n").cast("double") / F.col("df").cast("double"))
                * F.lit(float(IDF_SCALE)),
                0,
            ).cast("long").alias("w"),
        )
    )
    # the weighted index feeds three consumers (norms + both join sides);
    # persist it or the shingle explosion + md5 work runs three times
    # (same rationale as the minhash signature persist, plans/llm_dedup.py)
    weighted = persist_once(postings.join(idf, "term"))
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(F.col("w") * F.col("w")).cast("double")
            / F.lit(float(IDF_SCALE * IDF_SCALE))
        ).alias("nrm")
    )
    # attach each document's norm to its postings BEFORE the pair join —
    # the pair aggregate then carries both norms for free (norms are
    # constant within a group), instead of two post-hoc shuffle joins of
    # the pair relation against norms.  norms is one float per doc;
    # broadcast here, bucketed-join at the 1e9-doc scale.
    wn = weighted.join(F.broadcast(norms), "doc_id")
    a, b = wn.alias("a"), wn.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).alias("dot"),
            F.min("a.nrm").alias("na"),
            F.min("b.nrm").alias("nb"),
        )
    )
    return (
        dots.select(
            "doc_a", "doc_b",
            F.round(
                (
                    F.col("dot").cast("double")
                    / F.lit(float(IDF_SCALE * IDF_SCALE))
                )
                / (F.col("na") * F.col("nb")),
                LOG_DECIMALS,
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= TFIDF_COS_THRESHOLD)
    )


def _tfidf_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.llm_dedup import CORPUS_DUCK

    return f"""
WITH corpus AS ({CORPUS_DUCK}),
postings AS (
  SELECT doc_id, unnest({_SH_D}) AS term FROM corpus
),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM corpus),
idf AS (
  SELECT term,
         CAST(ROUND(LN(CAST(nd.n AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                    * 1e6, 0) AS BIGINT) AS w
  FROM postings, nd
  GROUP BY term, nd.n
  HAVING COUNT(*) <= {DF_CAP}
),
weighted AS (
  SELECT p.doc_id, p.term, i.w FROM postings p JOIN idf i ON p.term = i.term
),
norms AS (
  SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE) / 1e12) AS nrm
  FROM weighted GROUP BY 1
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
  FROM weighted a
  JOIN weighted b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.doc_a, d.doc_b,
       ROUND((CAST(d.dot AS DOUBLE) / 1e12) / (na.nrm * nb.nrm),
             {LOG_DECIMALS}) AS cosine_sim
FROM dots d
JOIN norms na ON na.doc_id = d.doc_a
JOIN norms nb ON nb.doc_id = d.doc_b
WHERE ROUND((CAST(d.dot AS DOUBLE) / 1e12) / (na.nrm * nb.nrm),
            {LOG_DECIMALS}) >= {TFIDF_COS_THRESHOLD}
"""


register(QuerySpec("nb_classify", nb_classify, NB_ORACLE,
                   tags=("LLM-CLASSIFY",)))
register(QuerySpec("tfidf_topk_pairs", tfidf_topk_pairs, _tfidf_oracle(),
                   tags=("LLM-CLASSIFY", "LLM-DEDUP")))
