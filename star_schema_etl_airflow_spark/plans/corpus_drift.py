"""Corpus distribution-drift monitor — Population Stability Index
between two ingest versions (the "did the new crawl shift the language
mix" check a curation pipeline runs before retraining mixture weights;
PSI is the standard model-monitoring drift statistic: < 0.1 stable,
0.1–0.25 moderate, > 0.25 action).

    PSI = Σ_bucket (p_b − q_b) · ln(p_b / q_b)

Here the buckets are languages, ``p`` the at-rest share and ``q`` the
delta-batch share (even/odd doc_id halves — the repo's standing
two-ingest-days convention).  Cross-engine exactness: shares are exact
integer ratios (one double division each); the only transcendental,
``ln(p/q)``, goes through the micro-ln BIGINT contract
(``round(ln·1e6)``, the ``plans/bm25.py`` idf pattern) so both engines
carry the identical integer; the per-bucket term is one multiply and a
round.  Zero buckets (a language present in only one half — the
STRONGEST drift signal) are epsilon-smoothed: shares are floored at
``EPS = 1e-6`` inside the log AND the difference (the standard PSI
zero-bucket treatment), with the identical ``GREATEST`` expression in
both engines, so a vanishing/appearing language yields a large finite
term instead of NULL/overflow.  Non-zero buckets are unaffected (every
real share is ≥ 1/corpus ≫ EPS).  Scale: two map-side-combined count
aggregations (bucket-sized output), one broadcast of the 1-row totals
— no corpus-sized joins.

Reference parity: beyond-reference (LLM-pipeline monitoring extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

LN_SCALE = 1_000_000
PSI_DECIMALS = 9
# zero-bucket smoothing floor: far below any real share (>= 1/corpus),
# far above double rounding noise; identical literal in the oracle.
EPS = 1e-6


def psi_terms(counts: DataFrame) -> DataFrame:
    """PSI rows from a ``(lang, n_at, n_delta)`` bucket-count relation —
    the statistic core, shared by the batch monitor and the streaming
    twin (``streaming/drift_stream.py``, which maintains the delta
    counts incrementally)."""
    totals = counts.agg(
        F.sum("n_at").alias("t_at"), F.sum("n_delta").alias("t_delta")
    )
    p = F.col("n_at").cast("double") / F.col("t_at").cast("double")
    q = F.col("n_delta").cast("double") / F.col("t_delta").cast("double")
    # epsilon-smoothed shares: defined (and large) on one-sided buckets
    ps = F.greatest(p, F.lit(EPS))
    qs = F.greatest(q, F.lit(EPS))
    # micro-ln BIGINT: the bm25 idf determinism contract
    w = F.round(F.log(ps / qs) * F.lit(float(LN_SCALE)), 0).cast("long")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "n_at",
            "n_delta",
            F.round(p, PSI_DECIMALS).alias("p_at"),
            F.round(q, PSI_DECIMALS).alias("q_delta"),
            w.alias("ln_ratio_micro"),
            F.round(
                (ps - qs) * (w.cast("double") / F.lit(float(LN_SCALE))),
                PSI_DECIMALS,
            ).alias("psi_term"),
        )
    )


def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(
        F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("n_at"),
        F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("n_delta"),
    )
    return psi_terms(counts)


# the PSI-term SQL over a (lang, n_at, n_delta) counts CTE, shared by
# the standing monitor's oracle and the one-sided-bucket variant's
_PSI_TAIL = f"""
totals AS (
  SELECT SUM(n_at) AS t_at, SUM(n_delta) AS t_delta FROM counts
),
terms AS (
  SELECT c.lang, c.n_at, c.n_delta,
         CAST(c.n_at AS DOUBLE) / CAST(t.t_at AS DOUBLE) AS p,
         CAST(c.n_delta AS DOUBLE) / CAST(t.t_delta AS DOUBLE) AS q,
         GREATEST(CAST(c.n_at AS DOUBLE) / CAST(t.t_at AS DOUBLE),
                  {EPS!r}) AS ps,
         GREATEST(CAST(c.n_delta AS DOUBLE) / CAST(t.t_delta AS DOUBLE),
                  {EPS!r}) AS qs
  FROM counts c CROSS JOIN totals t
)
SELECT lang,
       CAST(n_at AS BIGINT) AS n_at,
       CAST(n_delta AS BIGINT) AS n_delta,
       ROUND(p, {PSI_DECIMALS}) AS p_at,
       ROUND(q, {PSI_DECIMALS}) AS q_delta,
       CAST(ROUND(LN(ps / qs) * {LN_SCALE}.0, 0) AS BIGINT)
         AS ln_ratio_micro,
       ROUND((ps - qs)
             * (CAST(CAST(ROUND(LN(ps / qs) * {LN_SCALE}.0, 0) AS BIGINT)
                     AS DOUBLE) / {LN_SCALE}.0),
             {PSI_DECIMALS}) AS psi_term
FROM terms
"""

CORPUS_DRIFT_ORACLE = f"""
WITH counts AS (
  SELECT lang,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_at,
         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS n_delta
  FROM documents GROUP BY lang
),
{_PSI_TAIL}"""

register(QuerySpec("corpus_drift_psi", corpus_drift_psi,
                   CORPUS_DRIFT_ORACLE, tags=("llm", "MONITORING")))


def corpus_drift_psi_onesided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The monitor on a split that GUARANTEES one-sided buckets — the
    delta half drops the corpus's most frequent language entirely (a
    language vanishing from the new crawl, the strongest drift signal).
    Exercises the epsilon-smoothed zero-bucket path end-to-end: the
    vanished language's bucket has ``n_delta = 0`` and must yield a
    large finite positive ``psi_term`` in BOTH engines, not NULL or a
    saturated cast (the pre-smoothing failure mode: Spark ln(inf) →
    Long.MaxValue vs DuckDB LN(0) → error)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    top = (
        docs.groupBy("lang").count()
        .orderBy(F.col("count").desc(), F.col("lang").asc())
        .limit(1)
    )
    tagged = docs.crossJoin(
        F.broadcast(top.select(F.col("lang").alias("top_lang")))
    )
    counts = tagged.groupBy("lang").agg(
        F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("n_at"),
        F.sum(
            ((F.col("doc_id") % 2 == 1)
             & (F.col("lang") != F.col("top_lang"))).cast("long")
        ).alias("n_delta"),
    )
    return psi_terms(counts)


CORPUS_DRIFT_ONESIDED_ORACLE = f"""
WITH top AS (
  SELECT lang AS top_lang FROM documents
  GROUP BY lang ORDER BY COUNT(*) DESC, lang ASC LIMIT 1
),
counts AS (
  SELECT d.lang,
         SUM(CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_at,
         SUM(CASE WHEN d.doc_id % 2 = 1 AND d.lang <> t.top_lang
                  THEN 1 ELSE 0 END) AS n_delta
  FROM documents d CROSS JOIN top t
  GROUP BY d.lang
),
{_PSI_TAIL}"""

register(QuerySpec("corpus_drift_psi_onesided", corpus_drift_psi_onesided,
                   CORPUS_DRIFT_ONESIDED_ORACLE,
                   tags=("llm", "MONITORING")))


# --- two-sample Kolmogorov-Smirnov drift on a numeric property --------------
#
# The PSI monitor watches a CATEGORICAL mix (languages); this is its
# numeric sibling: the two-sample KS statistic D = sup_x |F_at(x) −
# F_delta(x)| between the at-rest and delta document-length
# distributions — the standard distribution-shift test when the
# monitored property is continuous-ish.  Unlike PSI it needs no
# binning policy and no smoothing: D is a maximum of differences of
# exact integer-count ratios, so the whole statistic is rational —
# one double division per side and a subtract, no transcendental at
# all.  Scale: one value-grain count aggregation (distinct lengths ≪
# corpus), two window cumulative sums over the value-sorted relation,
# one 1-row max — no corpus-sized joins.

KS_DECIMALS = 9


def ks_statistic(counts: DataFrame) -> DataFrame:
    """The KS core over a ``(n_chars, c_at, c_delta)`` value-grain count
    relation — shared by the batch monitor and the streaming twin
    (``streaming/drift_stream.py`` maintains the delta counts
    incrementally, exactly like the PSI twin)."""
    from pyspark.sql import Window

    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    totals = counts.agg(
        F.sum("c_at").alias("t_at"), F.sum("c_delta").alias("t_delta")
    )
    gaps = (
        counts.withColumn("cum_at", F.sum("c_at").over(w))
        .withColumn("cum_delta", F.sum("c_delta").over(w))
        .crossJoin(F.broadcast(totals))
        .select(
            "n_chars", "t_at", "t_delta",
            F.round(
                F.abs(
                    F.col("cum_at").cast("double")
                    / F.col("t_at").cast("double")
                    - F.col("cum_delta").cast("double")
                    / F.col("t_delta").cast("double")
                ),
                KS_DECIMALS,
            ).alias("gap"),
        )
    )
    return (
        gaps.groupBy("t_at", "t_delta")
        .agg(
            F.max("gap").alias("ks_d"),
            F.min_by("n_chars", F.struct(
                (-F.col("gap")).alias("g"), F.col("n_chars").alias("v")
            )).alias("at_value"),
        )
        .select(
            F.col("t_at").cast("long").alias("n_at"),
            F.col("t_delta").cast("long").alias("n_delta"),
            "ks_d",
            F.col("at_value").cast("long").alias("at_value"),
        )
    )


def corpus_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_at, n_delta, ks_d, at_value): the two-sample KS statistic on
    ``n_chars`` between the even/odd doc_id halves (the standing
    two-ingest-days split), with the smallest length attaining the
    supremum as the deterministic witness."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    counts = docs.groupBy("n_chars").agg(
        F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("c_at"),
        F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("c_delta"),
    )
    return ks_statistic(counts)


CORPUS_DRIFT_KS_ORACLE = f"""
WITH counts AS (
  SELECT n_chars,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS c_at,
         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS c_delta
  FROM documents GROUP BY n_chars
),
totals AS (
  SELECT SUM(c_at) AS t_at, SUM(c_delta) AS t_delta FROM counts
),
gaps AS (
  SELECT c.n_chars, t.t_at, t.t_delta,
         ROUND(ABS(
           CAST(SUM(c.c_at) OVER (ORDER BY c.n_chars) AS DOUBLE)
             / CAST(t.t_at AS DOUBLE)
           - CAST(SUM(c.c_delta) OVER (ORDER BY c.n_chars) AS DOUBLE)
             / CAST(t.t_delta AS DOUBLE)), {KS_DECIMALS}) AS gap
  FROM counts c CROSS JOIN totals t
)
SELECT CAST(t_at AS BIGINT) AS n_at,
       CAST(t_delta AS BIGINT) AS n_delta,
       MAX(gap) AS ks_d,
       CAST(MIN(n_chars) FILTER (
         WHERE gap = (SELECT MAX(gap) FROM gaps)) AS BIGINT) AS at_value
FROM gaps
GROUP BY t_at, t_delta
"""

register(QuerySpec("corpus_drift_ks", corpus_drift_ks,
                   CORPUS_DRIFT_KS_ORACLE, tags=("llm", "MONITORING")))


# --- KS gate: monitor → critical value → action (r14 verdict task 6) -------

# Two-sample KS critical value D_crit = c(α) · sqrt((n+m)/(n·m)) with
# c(α) = sqrt(-ln(α/2)/2); α = 0.01 → c ≈ 1.6276236.  Sample-size-aware
# (a fixed D threshold would be trivially exceeded at small n and never
# at corpus scale) and rational-plus-one-sqrt, so it is reproducible in
# any engine.  The standing even/odd fixture split is QUIET under it at
# all three SFs (ks_d 0.08/0.116/0.019 vs crit 0.146/0.146/0.046).
KS_ALPHA_C = 1.6276236


def drift_gate_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KS monitor's gate verdict as a differential query — the
    length-drift analog of the PSI gate (``plans/drift_gate.py``):
    two-sample KS on ``n_chars`` between the standing even/odd split,
    compared against the α=0.01 critical value, with the action the
    pipeline stage would take ('refresh_profile' / 'noop').  The
    side-effecting composition (publish-on-drift inside the audited
    runner) is ``add_ks_gated_refresh``; this query pins the VERDICT
    arithmetic cross-engine."""
    ks = corpus_drift_ks(spark, sf_dir)
    crit = (
        F.lit(KS_ALPHA_C)
        * F.sqrt(
            (F.col("n_at") + F.col("n_delta")).cast("double")
            / (F.col("n_at") * F.col("n_delta")).cast("double")
        )
    )
    return ks.select(
        "n_at", "n_delta", "ks_d", "at_value",
        F.round(crit, KS_DECIMALS).alias("ks_crit"),
        (F.col("ks_d") > F.round(crit, KS_DECIMALS)).alias("drifted"),
        F.when(F.col("ks_d") > F.round(crit, KS_DECIMALS),
               F.lit("refresh_profile"))
        .otherwise(F.lit("noop")).alias("action"),
    )


DRIFT_GATE_KS_ORACLE = f"""
WITH ks AS ({CORPUS_DRIFT_KS_ORACLE}),
v AS (
  SELECT *, ROUND({KS_ALPHA_C} * sqrt(
    CAST(n_at + n_delta AS DOUBLE) / CAST(n_at * n_delta AS DOUBLE)
  ), {KS_DECIMALS}) AS ks_crit
  FROM ks
)
SELECT n_at, n_delta, ks_d, at_value, ks_crit,
       ks_d > ks_crit AS drifted,
       CASE WHEN ks_d > ks_crit THEN 'refresh_profile'
            ELSE 'noop' END AS action
FROM v
"""

register(QuerySpec("drift_gate_ks", drift_gate_ks, DRIFT_GATE_KS_ORACLE,
                   tags=("llm", "MONITORING")))
