"""Embedding scalar quantization — the storage/bandwidth step of a
large-scale vector pipeline (float32 → int8 is a 4× reduction; at 100 TB
of embeddings that is the difference between caching the corpus in
executor memory and not).

Per-vector symmetric int8 quantization, the form every ANN system
(FAISS ``SQ8``, ScaNN, Milvus) ships:

    scale = max(|x_i|) / 127
    q_i   = floor(x_i / scale + 0.5)        in [-127, 127]
    x̂_i  = q_i * scale                      (dequantized)

``floor(v + 0.5)`` is used instead of ``round(v)`` deliberately: both
engines implement ``floor`` exactly per IEEE-754, while ``round``
half-way tie policies differ between engines (HALF_UP vs banker's) —
the explicit form makes Spark and DuckDB bit-identical, so the oracle
check is exact, not tolerance-based.

Scale design: strictly map-only — no shuffle, no window, no join; the
whole operator is one projection inside whole-stage codegen (array
higher-order functions over the embedding column).  Runs at any corpus
size at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

INT8_MAX = 127


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append ``scale`` (double), ``qvec`` (array<tinyint>), and
    ``max_abs_err`` (double, max per-element reconstruction error) to a
    frame with an array<float> ``vec_col``.  Map-only; zero vectors
    quantize to all-zero with scale 0."""
    amax = (
        f"aggregate({vec_col}, cast(0 as double), "
        f"(a, x) -> greatest(a, abs(cast(x as double))))"
    )
    return (
        df.withColumn("scale", F.expr(f"{amax} / {INT8_MAX}.0d"))
        .withColumn(
            "qvec",
            F.expr(
                f"transform({vec_col}, x -> cast(CASE WHEN scale = 0.0d "
                f"THEN 0.0d ELSE floor(cast(x as double) / scale + 0.5d) "
                f"END as tinyint))"
            ),
        )
        .withColumn(
            "max_abs_err",
            F.expr(
                f"CASE WHEN scale = 0.0d THEN 0.0d ELSE "
                f"aggregate({vec_col}, cast(0 as double), (a, x) -> "
                f"greatest(a, abs(cast(x as double) - "
                f"floor(cast(x as double) / scale + 0.5d) * scale))) END"
            ),
        )
    )


def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize the fixture embedding corpus; the error column doubles as
    the quality audit (max error is bounded by scale/2 by construction).

    ``qvec`` is emitted as a '|'-joined string of the int8 codes (the
    array form stays internal, see ``quantize_int8``): the differential
    harness canonicalizes through pandas, which cannot hash list cells."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return quantize_int8(emb).select(
        "vec_id",
        "scale",
        F.array_join(F.expr("transform(qvec, x -> cast(x as string))"), "|")
        .alias("qvec"),
        "max_abs_err",
    )


EMBED_QUANTIZE_ORACLE = f"""
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) / {INT8_MAX}.0 AS scale
  FROM embeddings
)
SELECT vec_id, scale,
       array_to_string(
         list_transform(embedding, x -> CAST(CAST(
           CASE WHEN scale = 0.0 THEN 0.0
                ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END AS TINYINT)
           AS VARCHAR)),
         '|') AS qvec,
       CASE WHEN scale = 0.0 THEN 0.0 ELSE
         list_max(list_transform(embedding, x ->
           abs(CAST(x AS DOUBLE) -
               floor(CAST(x AS DOUBLE) / scale + 0.5) * scale)))
       END AS max_abs_err
FROM s
"""

register(QuerySpec("embed_quantize_int8", embed_quantize_int8,
                   EMBED_QUANTIZE_ORACLE, tags=("LLM-similarity", "quantize")))


# --- SQ8 shortlist + exact re-rank ------------------------------------------
#
# The search half of scalar quantization (FAISS SQ8 flat search): score
# every candidate against each query IN THE INT8 DOMAIN — the integer
# dot of the code arrays, with the per-vector scales cancelling out of
# the cosine — keep a per-query shortlist, then exact-cosine re-rank
# only the shortlist.  Same two-stage shape as the JL path
# (plans/jl_projection.embed_jl_rerank); what changes is the compressed
# domain: SQ8 preserves direction per-vector (4x smaller, ~no recall
# loss on isotropic data), JL compresses dimensionality.
#
# Determinism: the code-domain dot and squared norms are EXACT BIGINT
# sums (max |q|=127 -> a term <= 16129, x64 << 2^63); the approximate
# cosine divides the exact dot by the product of sqrts of exact ints —
# every double op identical on both engines, so ranks (tie-broken by
# cand_id) match without rounding.

SQ_SHORTLIST = 100
SQ_TOP_K = 10


def embed_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from star_schema_etl_airflow_spark.functions.vecexpr import (
        unrolled_int_dot,
    )
    from star_schema_etl_airflow_spark.plans.llm_similarity import (
        EMB_DIM,
        N_QUERIES,
        _cos_spark,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # per-row code norm BEFORE the cross join: the sqrt of an exact
    # integer self-dot, computed once per vector, never per pair
    qn = f"sqrt(cast(({unrolled_int_dot('qvec', 'qvec', EMB_DIM)}) as double))"
    # Zero-norm guard: an all-zero embedding quantizes to qnorm = 0,
    # making the approx cosine NaN — and Spark sorts NaN ABOVE all
    # doubles in DESC order, so such vectors would hijack a shortlist
    # slot for every query (DuckDB's NaN ordering also diverges).
    # Zero vectors have no direction, hence no cosine rank: drop them
    # on both sides before the shortlist window (mirrored in the
    # oracle's WHERE).
    q8 = quantize_int8(emb).select(
        "vec_id", "qvec", F.expr(qn).alias("qnorm")
    ).filter(F.col("qnorm") > 0)
    q = q8.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("qa"),
        F.col("qnorm").alias("na"),
    )
    c = q8.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("qvec").alias("qb"),
        F.col("qnorm").alias("nb"),
    )
    approx = (
        F.expr(f"cast(({unrolled_int_dot('qa', 'qb', EMB_DIM)}) as double)")
        / (F.col("na") * F.col("nb"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("cand_id")
    )
    shortlist = (
        F.broadcast(q)
        .crossJoin(c)
        .select("query_id", "cand_id", approx.alias("approx"))
        .withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= SQ_SHORTLIST)
        .select("query_id", "cand_id")
    )
    qe = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    ce = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
    )
    rescored = (
        ce.join(F.broadcast(shortlist), "cand_id")
        .join(F.broadcast(qe), "query_id")
        .select(
            "query_id", "cand_id",
            F.expr(_cos_spark("qv", "cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SQ_TOP_K)
    )


def _sq8_rerank_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.llm_similarity import (
        EMB_DIM,
        N_QUERIES,
        _cos_duck,
    )

    idot = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
            f"d -> CAST(q.qvec[d] AS BIGINT) * CAST(c.qvec[d] AS BIGINT)))")
    selfdot = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
               f"d -> CAST(qvec[d] AS BIGINT) * CAST(qvec[d] AS BIGINT)))")
    return f"""
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) / {INT8_MAX}.0 AS scale
  FROM embeddings
),
q8 AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(
           CASE WHEN scale = 0.0 THEN 0.0
                ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END
           AS TINYINT)) AS qvec
  FROM s
),
qn AS (
  SELECT vec_id, qvec, sqrt(CAST({selfdot} AS DOUBLE)) AS qnorm FROM q8
),
shortlist AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST({idot} AS DOUBLE) / (q.qnorm * c.qnorm) DESC,
                      c.vec_id) AS srank
    FROM qn q CROSS JOIN qn c
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
      AND q.qnorm > 0 AND c.qnorm > 0
  ) WHERE srank <= {SQ_SHORTLIST}
),
rescored AS (
  SELECT s.query_id, s.cand_id,
         {_cos_duck('qe.embedding', 'ce.embedding')} AS cosine
  FROM shortlist s
  JOIN embeddings qe ON qe.vec_id = s.query_id
  JOIN embeddings ce ON ce.vec_id = s.cand_id
)
SELECT query_id, cand_id, cosine, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM rescored
)
WHERE rank <= {SQ_TOP_K}
"""


register(QuerySpec("embed_sq8_rerank", embed_sq8_rerank,
                   _sq8_rerank_oracle(), tags=("LLM-similarity", "quantize")))
