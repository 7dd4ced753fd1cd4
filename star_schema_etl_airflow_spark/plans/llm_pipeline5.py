"""Curation pipeline v5 — the round-6 operators composed end-to-end:
exact-substring excision → minimum-surviving-tokens gate → JL
sign-bucket semantic dedup over embeddings → per-language rollup.

The recipe: remove duplicated SPANS first (Lee et al. ExactSubstr —
boilerplate vanishes but documents survive), gate out documents the
excision hollowed out, then drop *semantic* near-duplicates by
sign-random-projection LSH over the embedding column (Charikar 2002:
the sign pattern of a few random projections is a locality-sensitive
fingerprint; embedded here as the top ``V5_BUCKET_BITS`` components of
the deterministic JL projection — all-integer, so the bucket id is
byte-identical across engines and partitionings), keeping the lowest
doc_id per bucket.  Every stage is the registry operator it reuses —
the pipeline proves the COMPOSITION against one chained-CTE oracle.

Scale shape: substring mining is the only tokens-sized shuffle
(operators/substring_dedup.py); the gate is map-side; the embedding
join is an equi-join on the id; projection + bucketing are map-only
int64 codegen; the per-bucket argmin is an aggregate with map-side
combine (never a window); the rollup groups on a languages-sized key.
Stage order matters at 100 TB: excision FIRST shrinks the corpus that
the embedding join and dedup stages touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.substring_dedup import (
    duplicate_substring_spans,
    excise_spans,
)
from star_schema_etl_airflow_spark.plans.jl_projection import (
    _SIGNS,
    JL_SCALE,
    _proj_duck,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import build_corpus
from star_schema_etl_airflow_spark.plans.substring_queries import (
    EXCISED_CTES,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.functions.caching import persist_once

V5_MIN_TOKENS = 8        # survive only if excision left this many tokens
V5_BUCKET_BITS = 8       # sign bits of JL components p0..p7 → 256 buckets
V5_BASE_MOD = 1_000_000  # synthetic dup ids map to base via % 1e6

# fixed-point + signed-fold exprs (the jl_projection HOF shape, kept
# here since jl_projection's own Spark path is the Arrow matmul now)
_V5_EI = (f"transform(embedding, e -> "
          f"cast(floor(cast(e as double) * {JL_SCALE}) as bigint))")


def _v5_proj(k: int) -> str:
    arr = ", ".join(f"{s}L" for s in _SIGNS[k])
    return (f"aggregate(zip_with(__ei, array({arr}), (e, s) -> e * s), "
            f"0L, (acc, x) -> acc + x)")


def curation_pipeline_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the corpus feeds span mining (×2) and the excision join (×1);
    # persist the fixture-amplifier derivation once (see
    # plans/substring_queries.dedup_substring_spans for the rationale
    # and the production disposition)
    corpus = persist_once(build_corpus(spark, sf_dir))
    # 1) corpus-wide exact-substring excision
    excised = excise_spans(corpus, duplicate_substring_spans(corpus))
    # 2) gate: drop documents hollowed out by the excision
    gated = excised.filter(F.col("kept_tokens") >= V5_MIN_TOKENS).select(
        "doc_id", "kept_tokens"
    )
    # 3) attach embeddings (synthetic dup ids share their base's vector)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    wemb = gated.withColumn(
        "base_id", F.col("doc_id") % V5_BASE_MOD
    ).join(emb, F.col("base_id") == F.col("vec_id"))
    # 4) semantic near-dup removal: SRP-LSH bucket from the JL signs,
    #    lowest doc_id per bucket survives (argmin aggregate, no window)
    # HOF fold, not jl_projection.jl_project_cols: the post-gate
    # relation is small (survivors of the excision gate), where the
    # Arrow matmul's fixed Python-stage cost exceeds the entire lambda
    # eval (measured at sf0.1: 0.9s HOF vs ~3s added by mapInPandas);
    # the matmul path is for corpus-sized projections.
    proj = wemb.select(
        "doc_id", "kept_tokens", F.expr(_V5_EI).alias("__ei")
    ).select(
        "doc_id", "kept_tokens",
        *[F.expr(_v5_proj(k)).alias(f"p{k}")
          for k in range(V5_BUCKET_BITS)],
    )
    bucket = sum(
        F.when(F.col(f"p{k}") > 0, 1 << k).otherwise(0)
        for k in range(V5_BUCKET_BITS)
    )
    surv = (
        proj.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(F.min(F.struct("doc_id", "kept_tokens")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"),
                F.col("k.kept_tokens").alias("kept_tokens"))
    )
    # 5) per-language rollup (language of the base document)
    langs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("base_id"), "lang"
    )
    return (
        surv.withColumn("base_id", F.col("doc_id") % V5_BASE_MOD)
        .join(F.broadcast(langs), "base_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def _v5_oracle() -> str:
    projs = ", ".join(
        f"{_proj_duck(k, 'ei2')} AS p{k}" for k in range(V5_BUCKET_BITS)
    )
    bucket = " + ".join(
        f"(CASE WHEN p{k} > 0 THEN {1 << k} ELSE 0 END)"
        for k in range(V5_BUCKET_BITS)
    )
    return f"""
WITH {EXCISED_CTES},
gated AS (
  SELECT doc_id, kept_tokens FROM excised
  WHERE kept_tokens >= {V5_MIN_TOKENS}
),
wemb AS (
  SELECT g.doc_id, g.kept_tokens,
         list_transform(e.embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * 65536) AS BIGINT)) AS ei2
  FROM gated g JOIN embeddings e ON e.vec_id = g.doc_id % {V5_BASE_MOD}
),
proj5 AS (SELECT doc_id, kept_tokens, {projs} FROM wemb),
bucketed AS (
  SELECT doc_id, kept_tokens, CAST({bucket} AS BIGINT) AS bucket
  FROM proj5
),
surv AS (
  SELECT MIN(doc_id) AS doc_id,
         arg_min(kept_tokens, doc_id) AS kept_tokens
  FROM bucketed GROUP BY bucket
)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(s.kept_tokens) AS BIGINT) AS total_tokens,
       MIN(s.doc_id) AS min_doc_id,
       MAX(s.doc_id) AS max_doc_id
FROM surv s JOIN documents d ON d.doc_id = s.doc_id % {V5_BASE_MOD}
GROUP BY d.lang
"""


register(QuerySpec("curation_pipeline_v5", curation_pipeline_v5,
                   _v5_oracle(), headline=True, tags=("LLM-PIPELINE",)))
