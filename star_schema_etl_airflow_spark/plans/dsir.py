"""Importance-resampled data selection (DSIR) and leakage-safe splits.

Two curation operators a large-scale training-data pipeline runs after
dedup and before mixing:

- ``dsir_select`` — Data Selection via Importance Resampling (Xie et
  al. 2023): score every candidate document by how much more likely its
  hashed n-gram features are under a small in-domain *target* sample
  than under the raw pool, then draw the top-K by Gumbel-perturbed
  log-weight (the standard reparameterization of sampling-without-
  replacement proportional to exp(weight)).
- ``leakage_safe_split`` — train/val/test assignment hashed on the
  near-dup *cluster* id rather than the document id, so no near-
  duplicate pair ever straddles a split boundary (the eval-leakage
  failure mode of naive per-doc splitting).

Float determinism (cross-engine contract, same technique as
``plans/bm25.py``): the only transcendental is ``ln``; every ``ln`` is
taken of an exactly-representable ratio of int64 products, scaled by
1e6, rounded once, and carried as BIGINT from then on — per-document
weights are *integer* sums, so they are exact under any partitioning
and match DuckDB bit-for-bit.  The Gumbel noise is derived from an md5
hash, not an RNG: ``u = (md5_60bit(doc) % 1e6 + 0.5) / 1e6`` —
deterministic, reproducible, and identical in both engines.

Scale design (100 TB):

- feature hashing → a FIXED-width bucket table (``N_BUCKETS`` rows, a
  few KB) independent of corpus size; it is broadcast to the scoring
  join, so the corpus is shuffled once for the bucket counts and once
  (doc-keyed) for the per-doc weight sum — both with map-side combine.
- the exploded feature stream is persisted between those two passes at
  fixture scale; at corpus scale the second pass re-reads (two scans
  beat caching a corpus-sized intermediate).
- top-K selection is ``orderBy().limit()`` — Spark plans TakeOrdered
  (per-partition partial top-K, only K rows per partition reach the
  driver-side merge); no global sort, no single-partition window over
  the corpus.  The rank window afterwards touches exactly K rows.
- ``leakage_safe_split`` adds one map-side hash over the already-
  computed cluster relation — no shuffle beyond what clustering did.

Reference parity: beyond-reference (LLM-pipeline extension; the
reference has no data-selection stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    let_spark,
    md5_long_duck,
    md5_long_spark,
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.operators.sampling import hash_split
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.functions.caching import persist_once

# --- DSIR -------------------------------------------------------------------

N_BUCKETS = 1024          # hashed-feature table width (fixed, broadcastable)
HASH_SEED = "dsir"        # feature-hash seed
GUMBEL_SEED = "gumbel"    # per-doc noise seed (independent of HASH_SEED)
TOP_K = 64                # selection budget
TARGET_MOD = 13           # doc_id % 13 == 0 ⇒ in-domain target sample

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duck("text")

# unigram + bigram token occurrences (multiset — DSIR counts, not sets)
# let-bound: the tokenizer runs ONCE per document; an inline splice
# would re-split the text per bigram position inside the lambda
_FEATS_S = let_spark(
    _TOKS_S,
    "__ft",
    "concat(__ft, "
    "case when size(__ft) < 2 then cast(array() as array<string>) "
    "else transform(sequence(1, size(__ft) - 1), "
    "i -> concat(element_at(__ft, i), ' ', element_at(__ft, i + 1))) "
    "end)",
)
_FEATS_D = (
    f"list_concat({_TOKS_D}, "
    f"list_transform(range(1, len({_TOKS_D})), "
    f"i -> ({_TOKS_D})[i] || ' ' || ({_TOKS_D})[i + 1]))"
)

# log importance ratio per bucket, Laplace-smoothed, as micro-ln BIGINT:
#   lr[b] = round(1e6 · ln( (t_b+1)(R+B) / (r_b+1)(T+B) ))
# the int64 products are exact doubles (< 2^53), the division is then the
# identically-rounded IEEE op in both engines, and round(·1e6) absorbs any
# last-ulp ln() divergence (same contract as bm25's scaled-int idf).
_LR = (
    "cast(round(1000000.0 * ln("
    "cast((t_b + 1) * (rr + {B}) as double) / "
    "cast((r_b + 1) * (tt + {B}) as double))) as bigint)"
).format(B=N_BUCKETS)

# hash-derived Gumbel noise in micro-ln units: g = -ln(-ln(u))
_GUMBEL_S = (
    "cast(round(1000000.0 * ((-1.0) * ln((-1.0) * ln("
    f"(cast(pmod({md5_long_spark('cast(doc_id as string)', GUMBEL_SEED)}, "
    "1000000) as double) + 0.5) / 1000000.0)))) as bigint)"
)
_GUMBEL_D = (
    "CAST(round(1000000.0 * ((-1.0) * ln((-1.0) * ln("
    f"(CAST(({md5_long_duck('CAST(doc_id AS VARCHAR)', GUMBEL_SEED)}) % "
    "1000000 AS DOUBLE) + 0.5) / 1000000.0)))) AS BIGINT)"
)


def dsir_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, log_weight_micro) over ANY (doc_id, text) corpus — the
    corpus-parametric DSIR scoring core shared by ``dsir_select`` and
    the composed curation pipelines.  Target sample:
    ``doc_id % TARGET_MOD == 0``; every other document is scored."""
    feats = (
        docs.select(
            "doc_id",
            (F.col("doc_id") % TARGET_MOD == 0).alias("is_target"),
            F.explode(F.expr(_FEATS_S)).alias("feat"),
        )
        .select(
            "doc_id",
            "is_target",
            F.expr(
                f"pmod({md5_long_spark('feat', HASH_SEED)}, {N_BUCKETS})"
            ).alias("bucket"),
        )
    )
    feats = persist_once(feats)

    counts = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_b"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("r_b"),
    )
    totals = counts.agg(
        F.sum("t_b").alias("tt"), F.sum("r_b").alias("rr")
    )
    lr = (
        counts.crossJoin(F.broadcast(totals))
        .select("bucket", F.expr(_LR).alias("lr"))
    )

    return (
        feats.filter(~F.col("is_target"))
        .join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("lr").alias("log_weight_micro"))
    )


def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOP_K`` candidate documents by Gumbel-perturbed DSIR weight.

    Target sample: ``doc_id % TARGET_MOD == 0`` (stand-in for the small
    in-domain seed set); every other document is a selection candidate.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # the fixture is one parquet file → 1 scan partition; spread the
    # (compute-heavy) hashing over every core.  At corpus scale the input
    # arrives in many splits and this repartition is dropped.
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    weights = dsir_weights(docs)
    keyed = weights.select(
        "doc_id",
        "log_weight_micro",
        F.expr(_GUMBEL_S).alias("gumbel_micro"),
    ).withColumn(
        "sel_key", F.col("log_weight_micro") + F.col("gumbel_micro")
    )
    top = keyed.orderBy(F.desc("sel_key"), "doc_id").limit(TOP_K)
    # rank window over exactly TOP_K rows (post-limit), not the corpus
    return top.withColumn(
        "sel_rank",
        F.row_number().over(Window.orderBy(F.desc("sel_key"), "doc_id")),
    )


def dsir_weight_ctes(corpus: str = "documents") -> str:
    """CTE chain computing ``w(doc_id, log_weight_micro)`` over any
    ``(doc_id, text)`` relation — the oracle twin of
    :func:`dsir_weights`, reused by the composed pipeline oracles."""
    return f"""toks AS (
  SELECT doc_id, (doc_id % {TARGET_MOD} = 0) AS is_target, {_TOKS_D} AS t
  FROM {corpus}
),
feats AS (
  SELECT doc_id, is_target,
         unnest(list_concat(t, list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i + 1]))) AS feat
  FROM toks
),
fb AS (
  SELECT doc_id, is_target,
         ({md5_long_duck('feat', HASH_SEED)}) % {N_BUCKETS} AS bucket
  FROM feats
),
counts AS (
  SELECT bucket,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_b,
         SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS r_b
  FROM fb GROUP BY bucket
),
tot AS (SELECT SUM(t_b) AS tt, SUM(r_b) AS rr FROM counts),
lr AS (
  SELECT bucket,
         CAST(round(1000000.0 * ln(
           CAST((t_b + 1) * (rr + {N_BUCKETS}) AS DOUBLE) /
           CAST((r_b + 1) * (tt + {N_BUCKETS}) AS DOUBLE))) AS BIGINT) AS lr
  FROM counts, tot
),
w AS (
  -- CAST: DuckDB widens SUM(BIGINT) to HUGEINT (pandas float64); Spark
  -- keeps int64 — cast back so driver-side dtype hashing agrees.
  SELECT fb.doc_id, CAST(SUM(lr.lr) AS BIGINT) AS log_weight_micro
  FROM fb JOIN lr USING (bucket)
  WHERE NOT fb.is_target
  GROUP BY fb.doc_id
)"""


DSIR_ORACLE = f"""
WITH {dsir_weight_ctes()},
g AS (
  SELECT doc_id, log_weight_micro, {_GUMBEL_D} AS gumbel_micro FROM w
),
k AS (
  SELECT doc_id, log_weight_micro, gumbel_micro,
         log_weight_micro + gumbel_micro AS sel_key
  FROM g
)
SELECT doc_id, log_weight_micro, gumbel_micro, sel_key,
       CAST(ROW_NUMBER() OVER (ORDER BY sel_key DESC, doc_id) AS INTEGER)
         AS sel_rank
FROM k
ORDER BY sel_key DESC, doc_id
LIMIT {TOP_K}
"""


# --- leakage-safe split -----------------------------------------------------

SPLIT_SEED = "leakage"
SPLIT_CUTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, split): hash-split on the near-dup CLUSTER id.

    Composition of ``dedup_clusters`` (MinHash-LSH pairs → connected
    components → canonical id) with ``operators/sampling.hash_split``:
    every member of a near-dup cluster hashes identically, so duplicates
    can never leak across the train/eval boundary.
    """
    from star_schema_etl_airflow_spark.plans.llm_dedup import dedup_clusters

    comp = dedup_clusters(spark, sf_dir)
    return hash_split(
        comp, "cast(cluster_id as string)", SPLIT_SEED, SPLIT_CUTS
    ).select("doc_id", "cluster_id", "split")


def _leakage_oracle() -> str:
    from star_schema_etl_airflow_spark.operators.sampling import threshold
    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        DEDUP_CLUSTERS_ORACLE,
    )

    hi = 0.0
    arms, lo_t = [], 0
    for name, frac in SPLIT_CUTS.items():
        hi += frac
        hi_t = threshold(hi)
        arms.append(f"WHEN b >= {lo_t} AND b < {hi_t} THEN '{name}'")
        lo_t = hi_t
    case = "CASE " + " ".join(arms) + " END"
    return f"""
WITH clusters AS ({DEDUP_CLUSTERS_ORACLE}),
sp AS (
  SELECT doc_id, cluster_id,
         ({md5_long_duck('CAST(cluster_id AS VARCHAR)', SPLIT_SEED)})
           % 10000 AS b
  FROM clusters
)
SELECT doc_id, cluster_id, {case} AS split
FROM sp
WHERE {case} IS NOT NULL
"""


register(QuerySpec("dsir_select", dsir_select, DSIR_ORACLE,
                   tags=("llm", "curation")))
register(QuerySpec("leakage_safe_split", leakage_safe_split,
                   _leakage_oracle(), tags=("llm", "curation")))
