"""Johnson-Lindenstrauss random projection for embeddings + projected
top-k retrieval — the dimensionality-reduction front end a 100 TB ANN
pipeline runs before bucketing/scoring (Achlioptas 2003: a ±1 sign
matrix preserves pairwise distances like a Gaussian one, and costs only
integer adds).

Exactness contract: embeddings quantize to fixed-point BIGINTs
(``floor(e · 2^16)`` — floor, not round, so no .5-boundary can split
the engines), the sign matrix is a deterministic md5-derived literal
embedded in BOTH engines' expressions, and every projected component /
squared distance is exact int64 arithmetic — zero float ops anywhere,
so results are byte-identical under any partitioning, AQE re-plan, or
engine.  Overflow headroom: |component| ≤ 2^16·64·max|e| < 2^23 (unit-
ish vectors); squared-distance terms < 2^48, summed ×32 < 2^53 « 2^63.

Scale shape: projection is map-only (one Arrow-batched numpy sign
matmul per partition — see the note above ``jl_project_cols`` for why
this beats both SQL expression forms); the K-dim projected relation
is 2× narrower than the input for every downstream shuffle.  Retrieval
broadcasts the 10 projected queries and rides the partial
WindowGroupLimit top-k, same as the exact path
(``plans/llm_similarity.embed_topk_cosine``).  Recall vs the exact
top-k is pinned in ``tests/test_jl_projection.py``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.llm_similarity import (
    EMB_DIM,
    N_QUERIES,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

JL_K = 32               # projected dimensionality (64 → 32)
JL_SCALE = 65536        # fixed-point quantization: floor(e · 2^16)
JL_TOP_K = 10
JL_SEED = "jl-sign"


def _sign(k: int, d: int) -> int:
    h = hashlib.md5(f"{JL_SEED}|{k}|{d}".encode()).digest()
    return 1 if h[0] % 2 == 0 else -1


_SIGNS = [[_sign(k, d) for d in range(EMB_DIM)] for k in range(JL_K)]

# DuckDB side of the fixed-point conversion, once per row
_EI_D = (
    f"list_transform(embedding, e -> "
    f"CAST(floor(CAST(e AS DOUBLE) * {JL_SCALE}) AS BIGINT))"
)


def _proj_duck(k: int, ei: str = "ei") -> str:
    arr = ", ".join(str(s) for s in _SIGNS[k])
    return (
        f"CAST(list_sum(list_transform(range(1, {EMB_DIM} + 1), "
        f"d -> ({ei})[d] * ([{arr}])[d])) AS BIGINT)"
    )


# Spark side: one Arrow-batched pandas UDF doing the whole K x D sign
# matmul in int64 numpy.  Why not SQL expressions: the HOF form
# (aggregate(zip_with(...)) per component) evaluates ~4K interpreted
# lambdas per row, and the unrolled form (32 x 64 flat terms) compiles
# standalone but blows janino's 64 KB method limit once fused into a
# join stage, tripping whole-stage-codegen fallback for the ENTIRE
# stage (measured at sf0.1: 2.2s HOF, 8.2s fallback, sub-1s matmul).
# Exactness is preserved end-to-end: float32 -> float64 is exact,
# x * 2^16 scales the exponent only, floor is exact, and the matmul is
# int64 adds/subtracts — the same integers the SQL oracle computes.


def jl_project_cols(
    df: DataFrame, passthrough: list[str], n_components: int
) -> DataFrame:
    """Append the first ``n_components`` JL components as scalar BIGINT
    columns ``p0..p{n-1}`` next to ``passthrough``, consuming the
    ``embedding`` column.  Map-only: mapInPandas preserves partitioning,
    so no shuffle is introduced ahead of whatever consumes the
    projection."""
    from pyspark.sql.types import LongType, StructField, StructType

    src = df.select(*passthrough, "embedding")
    out_schema = StructType(
        [src.schema[c] for c in passthrough]
        + [StructField(f"p{k}", LongType()) for k in range(n_components)]
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        signs = np.asarray(_SIGNS[:n_components], dtype=np.int64).T  # D x K
        for pdf in batches:
            out = pd.DataFrame({c: pdf[c] for c in passthrough})
            if len(pdf):
                e = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                p = np.floor(e * JL_SCALE).astype(np.int64) @ signs
            else:
                p = np.zeros((0, n_components), dtype=np.int64)
            for k in range(n_components):
                out[f"p{k}"] = p[:, k]
            yield out

    return src.mapInPandas(gen, schema=out_schema)


def project_embeddings(emb: DataFrame) -> DataFrame:
    """(vec_id, p0..p{K-1}): the JL-projected fixed-point vector as K
    scalar columns (scalar, not array — driver-hashable and column-
    prunable downstream)."""
    return jl_project_cols(emb, ["vec_id"], JL_K)


def embed_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return project_embeddings(load_table(spark, sf_dir, "embeddings"))


_PROJ_CTE = f"""ei AS (
  SELECT vec_id, {_EI_D} AS ei FROM embeddings
),
proj AS (
  SELECT vec_id,
         {', '.join(f'{_proj_duck(k)} AS p{k}' for k in range(JL_K))}
  FROM ei
)"""

EMBED_JL_PROJECT_ORACLE = f"""
WITH {_PROJ_CTE}
SELECT * FROM proj
"""

register(QuerySpec("embed_jl_project", embed_jl_project,
                   EMBED_JL_PROJECT_ORACLE, tags=("LLM-ANN",)))


def _proj_split(emb: DataFrame):
    """Queries and candidates projected SEPARATELY, with the vec_id
    filter applied to the base table (r16, guide §4.1/§4.2): the
    mapInPandas projection is opaque to Catalyst, so filtering the
    PROJECTED relation cannot push below the Python boundary and both
    branches would re-run the full-corpus sign matmul.  Filtering first
    pushes the predicate into the parquet scan and each row crosses the
    boundary exactly once.  The projection is row-wise pure, so the
    split is value-identical."""
    q = project_embeddings(emb.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"p{k}").alias(f"q{k}") for k in range(JL_K)],
    )
    c = project_embeddings(emb.filter(F.col("vec_id") >= N_QUERIES)).select(
        F.col("vec_id").alias("cand_id"),
        *[F.col(f"p{k}") for k in range(JL_K)],
    )
    return q, c


def embed_jl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest candidates per query by squared distance in the
    projected space — all-integer scoring, broadcast queries, partial
    window-limit top-k."""
    q, c = _proj_split(load_table(spark, sf_dir, "embeddings"))
    dist = sum(
        (F.col(f"q{k}") - F.col(f"p{k}")) * (F.col(f"q{k}") - F.col(f"p{k}"))
        for k in range(JL_K)
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .select("query_id", "cand_id", dist.alias("jl_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("jl_dist", "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= JL_TOP_K)
    )


EMBED_JL_TOPK_ORACLE = f"""
WITH {_PROJ_CTE},
q AS (SELECT * FROM proj WHERE vec_id < {N_QUERIES}),
c AS (SELECT * FROM proj WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         {' + '.join(f'(q.p{k} - c.p{k}) * (q.p{k} - c.p{k})'
                     for k in range(JL_K))} AS jl_dist
  FROM q CROSS JOIN c
)
SELECT query_id, cand_id, jl_dist, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY jl_dist, cand_id) AS rank
  FROM scored
)
WHERE rank <= {JL_TOP_K}
"""

register(QuerySpec("embed_jl_topk", embed_jl_topk, EMBED_JL_TOPK_ORACLE,
                   tags=("LLM-ANN",)))


# --- two-stage retrieval: JL shortlist → exact cosine re-rank ---------------
#
# The fixture embeddings are isotropic random — the WORST case for any
# compressed-space ranking (neighbor margins are tiny), so a pure JL
# top-10 keeps only ~25% of the true neighbors.  The production shape is
# therefore two-stage: a cheap all-integer shortlist in the projected
# space (JL_SHORTLIST per query), then exact cosine only on the
# shortlist — 100 re-ranks per query instead of the whole corpus.
# Measured recall@10 vs the exact scan at sf0.01: 0.80 (pinned ≥ 0.7 in
# tests/test_jl_projection.py; chance is ~0.02).

JL_SHORTLIST = 100


def embed_jl_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from star_schema_etl_airflow_spark.plans.llm_similarity import (
        _cos_spark,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q, c = _proj_split(emb)
    dist = sum(
        (F.col(f"q{k}") - F.col(f"p{k}")) * (F.col(f"q{k}") - F.col(f"p{k}"))
        for k in range(JL_K)
    )
    w_short = Window.partitionBy("query_id").orderBy("jl_dist", "cand_id")
    shortlist = (
        F.broadcast(q)
        .crossJoin(c)
        .select("query_id", "cand_id", dist.alias("jl_dist"))
        .withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= JL_SHORTLIST)
        .select("query_id", "cand_id")
    )
    # exact re-rank of the queries×JL_SHORTLIST shortlist only: both
    # embedding lookups are equi-joins; the shortlist is control-plane
    # sized and broadcasts into them
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
        .filter(F.col("rank") <= JL_TOP_K)
    )


def _jl_rerank_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.llm_similarity import _cos_duck

    return f"""
WITH {_PROJ_CTE},
q AS (SELECT * FROM proj WHERE vec_id < {N_QUERIES}),
c AS (SELECT * FROM proj WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         {' + '.join(f'(q.p{k} - c.p{k}) * (q.p{k} - c.p{k})'
                     for k in range(JL_K))} AS jl_dist
  FROM q CROSS JOIN c
),
shortlist AS (
  SELECT query_id, cand_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY jl_dist, cand_id) AS srank
    FROM scored
  ) WHERE srank <= {JL_SHORTLIST}
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
WHERE rank <= {JL_TOP_K}
"""


register(QuerySpec("embed_jl_rerank", embed_jl_rerank, _jl_rerank_oracle(),
                   headline=True, tags=("LLM-ANN",)))
