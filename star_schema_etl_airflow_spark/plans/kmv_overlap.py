"""KMV (k-minimum-values) bottom-k sketches for pairwise corpus
overlap — the constant-size answer to "how much does crawl A overlap
crawl B" that a 100 TB curation pipeline asks before mixing sources
(Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD'07).

Per source, the sketch is the K smallest distinct shingle hashes.  For
a source pair (a, b) the bottom-K of A∪B is computable from the two
sketches alone, and with U(K) = the Kth smallest normalized hash:

    û(A∪B)  = (K−1) / U(K)                 (distinct-union estimate)
    ĵ(A,B)  = |bottomK(A∪B) ∩ A ∩ B| / K   (Jaccard estimate)
    î(A∩B)  = round(ĵ · û)                 (intersection estimate)

When the pair's true distinct union is smaller than K the sketch IS
the union and all three collapse to exact values (k_used < K marks
those rows).  Everything is deterministic — the hash is the repo's
portable ``md5_long`` (functions/text.py) and the estimators are
closed-form arithmetic over it — so the DuckDB oracle reproduces the
ESTIMATES exactly; the estimate-vs-exact error is pinned separately in
``tests/test_kmv_overlap.py``.

Scale design (100 TB): the corpus participates ONLY in the sketch
build — one scan, shingle-explode, distinct, and a per-source bottom-K
that Catalyst bounds map-side (partial WindowGroupLimit before the
exchange: each input partition forwards at most K rows per source, so
the shuffle carries O(partitions·sources·K), never the corpus).  All
pairwise work happens on |sources|·K rows — for 10 000 sources at
K=128 that is ~1.3M rows, a broadcastable table; pair expansion is
bounded by |sources|²·K independent of corpus size — a bound that is
CENSUSED (logged per call) and ENFORCED (``MAX_PAIR_EXPANSION``) in
``pairwise_overlap``, so an all-pairs run over too many sources fails
loudly instead of silently launching a quadratic shuffle.  Sketches are also
mergeable across days (union two sketches → re-take bottom-K), the
property that makes them incremental at no extra cost.

Reference parity: beyond-reference (LLM-pipeline extension; the
reference has no sketching).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    md5_long_spark,
    shingles_duck,
    shingles_spark,
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

log = logging.getLogger(__name__)

K = 128                 # sketch size (σ_jaccard ≈ √(j(1−j)/K) ≈ 0.03 at j=0.1)
HASH_SPACE = 2.0**60    # md5_long range is [0, 2^60)
EST_DECIMALS = 9

# Deployment bound on the S²·K pair expansion: ~1e11 rows ≈ 4 TB of
# (pair, h, flags) shuffle — the point where all-pairs stops being the
# right algorithm (shard the source list instead).  At K=128 this
# admits ~28 000 sources.
MAX_PAIR_EXPANSION = 100_000_000_000

_SH_S = shingles_spark(tokens_spark("text"))
_SH_D = shingles_duck(tokens_duck("text"))
_H_S = md5_long_spark("s")
_H_D = md5_long_duck("s")


def kmv_sketches(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(source, h) — the K smallest distinct shingle hashes per source.
    The only corpus-sized stage; everything downstream is sketch-sized."""
    hashes = (
        docs.select(
            "source",
            F.explode(F.expr(f"transform({_SH_S}, s -> {_H_S})")).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("source").orderBy(F.col("h").asc())
    return (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("source", "h")
    )


def pairwise_overlap(
    sig: DataFrame, max_pair_rows: int = MAX_PAIR_EXPANSION
) -> DataFrame:
    """All-pairs estimates from a (source, h) sketch relation — shared
    by the at-rest operator and the incremental merge path.  ``sig`` is
    referenced by four downstream branches; callers persist it.

    The Θ(S²·K) pair expansion is the one stage whose size grows in the
    SQUARE of the source count, independent of corpus size — so it is
    censused at runtime (the no-silent-caps rule: the S²·K row count is
    logged on every call) and guarded: past ``max_pair_rows`` the call
    raises instead of silently launching an infeasible shuffle (round-12
    advice).  The census count is driver-side over the persisted
    SKETCH-sized relation — one distinct-count job on ≤ S·K rows, not a
    corpus scan."""
    srcs = sig.select("source").distinct()
    n_sources = srcs.count()
    pair_rows = n_sources * (n_sources - 1) // 2 * 2 * K
    log.info(
        "kmv pairwise census: %d sources -> %d pairs, <=%d expanded "
        "sketch rows (bound %d)",
        n_sources, n_sources * (n_sources - 1) // 2, pair_rows,
        max_pair_rows,
    )
    if pair_rows > max_pair_rows:
        raise ValueError(
            f"kmv pairwise expansion {pair_rows} rows ({n_sources} sources"
            f" x K={K}) exceeds the deployment bound {max_pair_rows}: "
            "all-pairs overlap is quadratic in sources — shard the "
            "source list or raise max_pair_rows deliberately"
        )
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
    )
    # per (pair, h): which side(s) hold h — dedups shared hashes and
    # carries the membership flags the match count needs.  The pair is
    # expanded to one row per side so the sketch join is an EQUI-join on
    # source (hash join), never an OR-predicate nested loop.
    sides = pairs.select(
        "source_a", "source_b", F.col("source_a").alias("source")
    ).unionByName(
        pairs.select("source_a", "source_b", F.col("source_b").alias("source"))
    )
    cand = (
        sides.join(sig, "source")
        .groupBy("source_a", "source_b", "h")
        .agg(
            F.max((F.col("source") == F.col("source_a")).cast("int"))
            .alias("in_a"),
            F.max((F.col("source") == F.col("source_b")).cast("int"))
            .alias("in_b"),
        )
    )
    wp = Window.partitionBy("source_a", "source_b").orderBy(F.col("h").asc())
    bot = cand.withColumn("rn", F.row_number().over(wp)).filter(
        F.col("rn") <= K
    )
    agg = bot.groupBy("source_a", "source_b").agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("h_k"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("matches"),
    )
    jac = F.round(
        F.col("matches").cast("double") / F.col("k_used").cast("double"),
        EST_DECIMALS,
    )
    union_est = F.when(F.col("k_used") < K, F.col("k_used")).otherwise(
        F.round(
            (F.col("k_used").cast("double") - F.lit(1.0))
            * F.lit(HASH_SPACE)
            / F.col("h_k").cast("double"),
            0,
        ).cast("long")
    )
    return agg.select(
        "source_a",
        "source_b",
        F.col("k_used").cast("int").alias("k_used"),
        F.col("matches").cast("long").alias("matches"),
        jac.alias("jaccard_est"),
        union_est.alias("union_est"),
        F.round(jac * union_est.cast("double"), 0)
        .cast("long")
        .alias("inter_est"),
    )


def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    # one corpus scan builds the sketch; everything after is sketch-sized
    return pairwise_overlap(persist_once(kmv_sketches(spark, docs)))


def _rebottom(sig: DataFrame) -> DataFrame:
    w = Window.partitionBy("source").orderBy(F.col("h").asc())
    return (
        sig.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("source", "h")
    )


def kmv_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INGEST path: yesterday's persisted sketch merged with the
    delta batch's sketch (union → re-take bottom-K), then the same
    pairwise estimates.  The oracle is the FULL-corpus rebuild — their
    exact equality is the KMV mergeability theorem checked
    differentially, which is what licenses maintaining the sketch
    incrementally at 100 TB instead of rescanning the corpus per day.
    (Here the 'old corpus' and 'delta' are the even/odd doc_id halves —
    a deterministic stand-in for two ingest days.)"""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    old = docs.filter(F.col("doc_id") % 2 == 0).drop("doc_id")
    delta = docs.filter(F.col("doc_id") % 2 == 1).drop("doc_id")
    merged = _rebottom(
        kmv_sketches(spark, old).unionByName(kmv_sketches(spark, delta))
    )
    return pairwise_overlap(persist_once(merged))


KMV_ORACLE = f"""
WITH hashes AS (
  SELECT DISTINCT source, {_H_D} AS h
  FROM (SELECT source, unnest({_SH_D}) AS s FROM documents)
),
sig AS (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC) AS rn
    FROM hashes
  ) WHERE rn <= {K}
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM (SELECT DISTINCT source FROM sig) a
  JOIN (SELECT DISTINCT source FROM sig) b ON a.source < b.source
),
sides AS (
  SELECT source_a, source_b, source_a AS source FROM pairs
  UNION ALL
  SELECT source_a, source_b, source_b AS source FROM pairs
),
cand AS (
  SELECT c.source_a, c.source_b, s.h,
         MAX(CASE WHEN s.source = c.source_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.source = c.source_b THEN 1 ELSE 0 END) AS in_b
  FROM sides c JOIN sig s ON s.source = c.source
  GROUP BY 1, 2, 3
),
bot AS (
  SELECT * FROM (
    SELECT source_a, source_b, h, in_a, in_b,
           ROW_NUMBER() OVER (
             PARTITION BY source_a, source_b ORDER BY h ASC
           ) AS rn
    FROM cand
  ) WHERE rn <= {K}
),
agg AS (
  SELECT source_a, source_b,
         COUNT(*) AS k_used, MAX(h) AS h_k,
         SUM(in_a * in_b) AS matches
  FROM bot GROUP BY 1, 2
)
SELECT source_a, source_b,
       CAST(k_used AS INTEGER) AS k_used,
       CAST(matches AS BIGINT) AS matches,
       ROUND(CAST(matches AS DOUBLE) / CAST(k_used AS DOUBLE),
             {EST_DECIMALS}) AS jaccard_est,
       CASE WHEN k_used < {K} THEN k_used
            ELSE CAST(ROUND((CAST(k_used AS DOUBLE) - 1.0) * {HASH_SPACE!r}
                            / CAST(h_k AS DOUBLE), 0) AS BIGINT)
       END AS union_est,
       CAST(ROUND(
         ROUND(CAST(matches AS DOUBLE) / CAST(k_used AS DOUBLE),
               {EST_DECIMALS})
         * CAST(CASE WHEN k_used < {K} THEN k_used
                     ELSE CAST(ROUND((CAST(k_used AS DOUBLE) - 1.0)
                                     * {HASH_SPACE!r}
                                     / CAST(h_k AS DOUBLE), 0) AS BIGINT)
                END AS DOUBLE), 0) AS BIGINT) AS inter_est
FROM agg
"""

register(QuerySpec("kmv_source_overlap", kmv_source_overlap, KMV_ORACLE,
                   tags=("LLM-SKETCH",)))
# same oracle ON PURPOSE: merge-then-estimate must equal rebuild exactly
register(QuerySpec("kmv_incremental_merge", kmv_incremental_merge,
                   KMV_ORACLE, tags=("LLM-SKETCH", "INCREMENTAL")))


# --- per-source distinct-cardinality estimates ------------------------------


def kmv_source_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-shingle cardinality from the sketch alone:
    û = (K−1)/U(K) (Beyer et al.'s unbiased bottom-K estimator), exact
    when the source's true distinct count fits the sketch (k_used < K).
    The per-pair union/intersection estimates (``pairwise_overlap``)
    divide by these to give containment ratios; here they are exposed
    per source so a mixing pipeline can budget against corpus diversity
    without any pairwise stage at all — one sketch scan, S output rows."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    sig = kmv_sketches(spark, docs)
    agg = sig.groupBy("source").agg(
        F.count("*").alias("k_used"), F.max("h").alias("h_k")
    )
    est = F.when(F.col("k_used") < K, F.col("k_used").cast("double")).otherwise(
        F.round(
            (F.col("k_used").cast("double") - F.lit(1.0))
            * F.lit(HASH_SPACE)
            / F.col("h_k").cast("double"),
            0,
        )
    )
    return agg.select(
        "source",
        F.col("k_used").cast("int").alias("k_used"),
        est.cast("long").alias("distinct_est"),
        (F.col("k_used") < K).alias("is_exact"),
    )


KMV_CARDINALITY_ORACLE = f"""
WITH hashes AS (
  SELECT DISTINCT source, {_H_D} AS h
  FROM (SELECT source, unnest({_SH_D}) AS s FROM documents)
),
sig AS (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC) AS rn
    FROM hashes
  ) WHERE rn <= {K}
),
agg AS (
  SELECT source, COUNT(*) AS k_used, MAX(h) AS h_k FROM sig GROUP BY source
)
SELECT source, CAST(k_used AS INTEGER) AS k_used,
       CAST(CASE WHEN k_used < {K} THEN CAST(k_used AS DOUBLE)
            ELSE ROUND((CAST(k_used AS DOUBLE) - 1.0) * {HASH_SPACE!r}
                       / CAST(h_k AS DOUBLE), 0)
       END AS BIGINT) AS distinct_est,
       k_used < {K} AS is_exact
FROM agg
"""

register(QuerySpec("kmv_source_cardinality", kmv_source_cardinality,
                   KMV_CARDINALITY_ORACLE, tags=("LLM-SKETCH",)))
