"""DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing
Data Mixtures Speeds Up Language Model Pretraining", NeurIPS 2023),
restated as a deterministic differential query: per-domain EXCESS LOSS
drives multiplicative-weights updates with uniform smoothing — the
published mixture-optimization loop, with the neural proxy/reference
models replaced by the repo's two closed-form corpus-trained scorers
so every quantity is engine-exact.

Mapping onto the paper:
- domains  = languages (the repo's standing bucket convention).
- reference model = the add-one BIGRAM LM (``plans/ngram_lm.py``'s
  model, rebuilt here with the domain column carried through);
  proxy model = the add-one UNIGRAM LM.  Excess loss per domain
  λ_d = max(0, L_uni(d) − L_bi(d)) — how much headroom the stronger
  model reveals, the paper's "learnability" signal, as micro-NLL
  BIGINTs (integer division of two exact integer sums).
- T multiplicative-weights rounds: raw_d = w_d · e_d with the boost
  e_d = round(1e6·exp(η·λ_d)) computed ONCE (λ is static here, so the
  boost compounds across rounds through renormalization), then
  w'_d = round((1−ε)·1e6·raw_d/Σraw + ε·1e6/D) — the paper's
  ε-uniform smoothing keeps every domain sampled.

Exactness: token/bigram counts, NLL sums, and per-domain averages are
BIGINT (positive // positive, floor = trunc in both engines); the two
transcendentals (ln inside the LM scores, exp inside the boost) go
through the micro-unit BIGINT contract (round(·1e6) — the bm25/psi
pattern), with realized-value distance from the .5 rounding boundary
pinned in ``tests/test_doremi.py`` (the ln-boundary-margin
discipline, extended to exp).  Every per-round weight is a BIGINT;
each round's arithmetic is two exact-int divisions in double plus one
round — identical IEEE ops in both engines.

Scale (100 TB): ONE tokenize of the corpus feeds both models (the
``ngram_lm`` single-scan identities); everything after the two
(lang)-keyed aggregations is D-row arithmetic — the rounds loop
touches only the D-sized weight relation (D = number of domains), with
1-row totals broadcast.  η, ε, T are exact rationals/ints.

Reference parity: beyond-reference (LLM-pipeline mixing extension;
completes the sampling family: dsir / unimax / mixture_temperature /
mixture_refresh / doremi).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.functions.text import (
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

W_SCALE = 1_000_000
# η = 1/10 per micro-NLL unit (λ is an absolute micro-NLL gap, not the
# paper's per-step normalized loss, so the step size is scaled down):
# boost = exp(λ_micro / ETA_DEN_MICRO)
ETA_DEN_MICRO = 10_000_000.0
EPS_NUM, EPS_DEN = 1, 10   # ε = 0.1 uniform smoothing, exact rational
T_ROUNDS = 3

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duck("text")


def _domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, l_uni_micro, l_bi_micro, excess_micro, boost_micro) —
    the D-row relation every round reads."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")

    toks = persist_once(
        docs.select("lang", F.explode(F.expr(_TOKS_S)).alias("w"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("w").alias("v")
    )
    # unigram model: lp(w) = round(1e6·ln((c+1)/(n+v)))
    cw = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    lp_uni = cw.crossJoin(F.broadcast(totals)).select(
        "w",
        F.round(
            F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("n") + F.col("v")).cast("double")
            ) * F.lit(float(W_SCALE)), 0,
        ).cast("long").alias("lp"),
    )
    uni = (
        toks.join(lp_uni, "w")
        .groupBy("lang")
        .agg(
            (-F.sum("lp")).alias("nll"),
            F.count(F.lit(1)).alias("ntok"),
        )
        .select("lang", F.expr("nll div ntok").alias("l_uni_micro"))
    )

    # bigram model with the domain carried: c1 as the w2-marginal of
    # c2 (the ngram_lm window identity), v shared with the unigram's
    bg = persist_once(
        docs.select(
            "lang",
            F.explode(F.expr(
                f"CASE WHEN size({_TOKS_S}) < 2 THEN "
                "cast(array() as array<struct<w1:string,w2:string>>) "
                f"ELSE zip_with(slice({_TOKS_S}, 1, size({_TOKS_S}) - 1), "
                f"slice({_TOKS_S}, 2, size({_TOKS_S}) - 1), "
                "(a, b) -> named_struct('w1', a, 'w2', b)) END"
            )).alias("b"),
        ).select("lang", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    lp_bi = (
        c2.withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
        .crossJoin(F.broadcast(totals.select("v")))
        .select(
            "w1", "w2",
            F.round(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                ) * F.lit(float(W_SCALE)), 0,
            ).cast("long").alias("lp"),
        )
    )
    bi = (
        bg.join(lp_bi, ["w1", "w2"])
        .groupBy("lang")
        .agg(
            (-F.sum("lp")).alias("nll"),
            F.count(F.lit(1)).alias("nbg"),
        )
        .select("lang", F.expr("nll div nbg").alias("l_bi_micro"))
    )

    excess = F.greatest(
        F.lit(0).cast("long"),
        F.col("l_uni_micro") - F.col("l_bi_micro"),
    )
    return uni.join(bi, "lang").select(
        "lang", "l_uni_micro", "l_bi_micro",
        excess.alias("excess_micro"),
        F.round(
            F.exp(excess.cast("double") / F.lit(ETA_DEN_MICRO))
            * F.lit(float(W_SCALE)), 0,
        ).cast("long").alias("boost_micro"),
    )


def doremi_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(round, lang, excess_micro, boost_micro, weight_micro): the
    uniform start (round 0) and ``T_ROUNDS`` smoothed multiplicative
    updates.  All post-stats arithmetic is over the D-row relation."""
    stats = persist_once(_domain_stats(spark, sf_dir))
    d = stats.agg(F.count(F.lit(1)).alias("d"))

    w = stats.crossJoin(F.broadcast(d)).select(
        "lang", "excess_micro", "boost_micro",
        F.round(F.lit(float(W_SCALE)) / F.col("d").cast("double"), 0)
        .cast("long").alias("weight_micro"),
        "d",
    )
    out = w.select(
        F.lit(0).cast("int").alias("round"),
        "lang", "excess_micro", "boost_micro", "weight_micro",
    )
    for t in range(1, T_ROUNDS + 1):
        # truncate per-round lineage (the kmeans/components loop
        # discipline): without this the round-t branch re-plans rounds
        # 1..t-1 and the final union carries a quadratic plan (124
        # planned shuffles at T=3).  EAGER: each checkpoint is a
        # D-row job, and the measured end-to-end drops 24 s → 3.9 s —
        # the lazy variant re-derives the un-materialized checkpoint
        # in every union branch that references it
        w = w.localCheckpoint()
        raw = w.withColumn(
            "raw", F.col("weight_micro") * F.col("boost_micro")
        )
        tot = raw.agg(F.sum("raw").alias("s"))
        w = raw.crossJoin(F.broadcast(tot)).select(
            "lang", "excess_micro", "boost_micro",
            F.round(
                F.lit(float((EPS_DEN - EPS_NUM) * W_SCALE // EPS_DEN))
                * (F.col("raw").cast("double") / F.col("s").cast("double"))
                + F.lit(float(EPS_NUM * W_SCALE // EPS_DEN))
                / F.col("d").cast("double"),
                0,
            ).cast("long").alias("weight_micro"),
            "d",
        )
        out = out.unionByName(w.select(
            F.lit(t).cast("int").alias("round"),
            "lang", "excess_micro", "boost_micro", "weight_micro",
        ))
    return out


_STATS_CTES = f"""dm_toks AS (
  SELECT lang, unnest({_TOKS_D}) AS w FROM documents
),
dm_tot AS (
  SELECT COUNT(*) AS n, COUNT(DISTINCT w) AS v FROM dm_toks
),
dm_cw AS (SELECT w, COUNT(*) AS c FROM dm_toks GROUP BY w),
dm_lp_uni AS (
  SELECT w, CAST(round({W_SCALE}.0 * ln(
    CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))) AS BIGINT) AS lp
  FROM dm_cw CROSS JOIN dm_tot
),
dm_uni AS (
  SELECT lang, CAST(-SUM(lp) AS BIGINT) // COUNT(*) AS l_uni_micro
  FROM dm_toks t JOIN dm_lp_uni u ON t.w = u.w
  GROUP BY lang
),
dm_bg AS (
  SELECT lang, b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT lang, unnest(
      CASE WHEN len({_TOKS_D}) < 2 THEN [] ELSE
      list_transform(range(1, len({_TOKS_D})),
        i -> struct_pack(w1 := ({_TOKS_D})[i], w2 := ({_TOKS_D})[i + 1]))
      END) AS b
    FROM documents)
),
dm_c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM dm_bg GROUP BY 1, 2),
dm_c1 AS (SELECT w1, COUNT(*) AS c1 FROM dm_bg GROUP BY 1),
dm_lp_bi AS (
  SELECT c2.w1, c2.w2, CAST(round({W_SCALE}.0 * ln(
    CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + t.v AS DOUBLE)))
    AS BIGINT) AS lp
  FROM dm_c2 c2 JOIN dm_c1 c1 ON c2.w1 = c1.w1 CROSS JOIN dm_tot t
),
dm_bi AS (
  SELECT lang, CAST(-SUM(lp) AS BIGINT) // COUNT(*) AS l_bi_micro
  FROM dm_bg b JOIN dm_lp_bi m ON b.w1 = m.w1 AND b.w2 = m.w2
  GROUP BY lang
),
dm_stats AS (
  SELECT u.lang, u.l_uni_micro, b.l_bi_micro,
         GREATEST(CAST(0 AS BIGINT), u.l_uni_micro - b.l_bi_micro)
           AS excess_micro,
         CAST(round(exp(
           CAST(GREATEST(CAST(0 AS BIGINT), u.l_uni_micro - b.l_bi_micro)
                AS DOUBLE) / {ETA_DEN_MICRO!r}) * {W_SCALE}.0) AS BIGINT)
           AS boost_micro
  FROM dm_uni u JOIN dm_bi b ON u.lang = b.lang
),
dm_d AS (SELECT COUNT(*) AS d FROM dm_stats),
dm_w0 AS (
  SELECT lang, excess_micro, boost_micro,
         CAST(round({W_SCALE}.0 / CAST(d AS DOUBLE)) AS BIGINT)
           AS weight_micro, d
  FROM dm_stats CROSS JOIN dm_d
)"""


def _round_cte(t: int) -> str:
    keep = float((EPS_DEN - EPS_NUM) * W_SCALE // EPS_DEN)
    mix = float(EPS_NUM * W_SCALE // EPS_DEN)
    return f"""
dm_raw{t} AS (
  SELECT lang, excess_micro, boost_micro, d,
         weight_micro * boost_micro AS raw
  FROM dm_w{t - 1}
),
dm_tot{t} AS (SELECT SUM(raw) AS s FROM dm_raw{t}),
dm_w{t} AS (
  SELECT lang, excess_micro, boost_micro,
         CAST(round({keep!r} * (CAST(raw AS DOUBLE) / CAST(s AS DOUBLE))
              + {mix!r} / CAST(d AS DOUBLE)) AS BIGINT) AS weight_micro,
         d
  FROM dm_raw{t} CROSS JOIN dm_tot{t}
)"""


DOREMI_ORACLE = f"""
WITH {_STATS_CTES},{",".join(_round_cte(t) for t in range(1, T_ROUNDS + 1))}
{" UNION ALL ".join(
    f'''SELECT CAST({t} AS INTEGER) AS round, lang, excess_micro,
       boost_micro, weight_micro FROM dm_w{t}'''
    for t in range(0, T_ROUNDS + 1))}
"""

register(QuerySpec("doremi_mixture_weights", doremi_mixture_weights,
                   DOREMI_ORACLE, tags=("llm", "MIX")))


# --- RHO-LOSS: the same excess-loss signal at EXAMPLE grain -----------------

RHO_TOP_N = 200


def rho_loss_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reducible-holdout-loss data selection (Mindermann et al.,
    "Prioritized Training on Points that are Learnable, Worth
    Learning, and Not Yet Learnt", ICML 2022), deterministically: a
    document's REDUCIBLE loss is its loss under the weak proxy minus
    its loss under the stronger reference — here the per-doc average
    micro-NLL gap between the unigram and bigram corpus LMs (the same
    two closed-form scorers the DoReMi domain loop uses, at example
    grain).  High gap = learnable structure the weak model misses but
    the strong one captures; noise scores high under BOTH models and
    cancels.  Returns the top ``RHO_TOP_N`` selection, ranked.

    Docs with fewer than 2 tokens have no bigram loss and are excluded
    (inner join) — selection only considers scoreable examples.

    Scale: one corpus tokenize feeds both models (the ngram_lm
    single-scan identities); the rank is a TOP_N window — Catalyst's
    partial WindowGroupLimit bounds the exchange."""
    scored = rho_scored(spark, sf_dir)
    w = Window.orderBy(F.col("rho_micro").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RHO_TOP_N)
        .select("doc_id", "l_uni_micro", "l_bi_micro", "rho_micro",
                F.col("rank").cast("int").alias("rank"))
    )


def rho_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document reducible-loss scores ``(doc_id, l_uni_micro,
    l_bi_micro, rho_micro)`` WITHOUT the top-N cut — shared by
    :func:`rho_loss_select` and the v7 curation composition
    (``plans/llm_pipeline7.py``), which ranks within language under
    its own composed priority."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")

    toks = persist_once(
        docs.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("w"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("w").alias("v")
    )
    cw = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    lp_uni = cw.crossJoin(F.broadcast(totals)).select(
        "w",
        F.round(
            F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("n") + F.col("v")).cast("double")
            ) * F.lit(float(W_SCALE)), 0,
        ).cast("long").alias("lp"),
    )
    uni = (
        toks.join(lp_uni, "w").groupBy("doc_id")
        .agg((-F.sum("lp")).alias("nll"), F.count(F.lit(1)).alias("ntok"))
        .select("doc_id", F.expr("nll div ntok").alias("l_uni_micro"))
    )

    bg = persist_once(
        docs.select(
            "doc_id",
            F.explode(F.expr(
                f"CASE WHEN size({_TOKS_S}) < 2 THEN "
                "cast(array() as array<struct<w1:string,w2:string>>) "
                f"ELSE zip_with(slice({_TOKS_S}, 1, size({_TOKS_S}) - 1), "
                f"slice({_TOKS_S}, 2, size({_TOKS_S}) - 1), "
                "(a, b) -> named_struct('w1', a, 'w2', b)) END"
            )).alias("b"),
        ).select("doc_id", F.col("b.w1").alias("w1"),
                 F.col("b.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    lp_bi = (
        c2.withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
        .crossJoin(F.broadcast(totals.select("v")))
        .select(
            "w1", "w2",
            F.round(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                ) * F.lit(float(W_SCALE)), 0,
            ).cast("long").alias("lp"),
        )
    )
    bi = (
        bg.join(lp_bi, ["w1", "w2"]).groupBy("doc_id")
        .agg((-F.sum("lp")).alias("nll"), F.count(F.lit(1)).alias("nbg"))
        .select("doc_id", F.expr("nll div nbg").alias("l_bi_micro"))
    )

    return uni.join(bi, "doc_id").select(
        "doc_id", "l_uni_micro", "l_bi_micro",
        (F.col("l_uni_micro") - F.col("l_bi_micro")).alias("rho_micro"),
    )


RHO_LOSS_ORACLE = f"""
WITH dm_toks AS (
  SELECT doc_id, unnest({_TOKS_D}) AS w FROM documents
),
dm_tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT w) AS v FROM dm_toks),
dm_cw AS (SELECT w, COUNT(*) AS c FROM dm_toks GROUP BY w),
dm_lp_uni AS (
  SELECT w, CAST(round({W_SCALE}.0 * ln(
    CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))) AS BIGINT) AS lp
  FROM dm_cw CROSS JOIN dm_tot
),
dm_uni AS (
  SELECT doc_id, CAST(-SUM(lp) AS BIGINT) // COUNT(*) AS l_uni_micro
  FROM dm_toks t JOIN dm_lp_uni u ON t.w = u.w GROUP BY doc_id
),
dm_bg AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT doc_id, unnest(
      CASE WHEN len({_TOKS_D}) < 2 THEN [] ELSE
      list_transform(range(1, len({_TOKS_D})),
        i -> struct_pack(w1 := ({_TOKS_D})[i], w2 := ({_TOKS_D})[i + 1]))
      END) AS b
    FROM documents)
),
dm_c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM dm_bg GROUP BY 1, 2),
dm_c1 AS (SELECT w1, COUNT(*) AS c1 FROM dm_bg GROUP BY 1),
dm_lp_bi AS (
  SELECT c2.w1, c2.w2, CAST(round({W_SCALE}.0 * ln(
    CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + t.v AS DOUBLE)))
    AS BIGINT) AS lp
  FROM dm_c2 c2 JOIN dm_c1 c1 ON c2.w1 = c1.w1 CROSS JOIN dm_tot t
),
dm_bi AS (
  SELECT doc_id, CAST(-SUM(lp) AS BIGINT) // COUNT(*) AS l_bi_micro
  FROM dm_bg b JOIN dm_lp_bi m ON b.w1 = m.w1 AND b.w2 = m.w2
  GROUP BY doc_id
)
SELECT doc_id, l_uni_micro, l_bi_micro, rho_micro,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT u.doc_id, u.l_uni_micro, b.l_bi_micro,
         u.l_uni_micro - b.l_bi_micro AS rho_micro,
         ROW_NUMBER() OVER (
           ORDER BY u.l_uni_micro - b.l_bi_micro DESC, u.doc_id ASC)
           AS rank
  FROM dm_uni u JOIN dm_bi b ON u.doc_id = b.doc_id
) WHERE rank <= {RHO_TOP_N}
"""

register(QuerySpec("rho_loss_select", rho_loss_select, RHO_LOSS_ORACLE,
                   tags=("llm", "MIX")))
