"""Product quantization with asymmetric-distance scoring (IVFADC family).

The compression side of a billion-scale ANN index (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011): split
each vector into ``M`` subvectors, encode every subvector as the id of
its nearest per-subspace centroid (``M`` small ints replace ``D``
floats — here 8 codes replace 64 floats, a 32× compression), and score
queries against the *codes only* via per-query lookup tables (ADC):

    adc(q, x) = Σ_m  ||q_m − c_{m, code_m(x)}||²

Codebook: this oracle-checked query derives the per-subspace centroids
from the data deterministically — the ``K_C`` vectors right after the
query band (``N_QUERIES ≤ vec_id < N_QUERIES+K_C``) serve as centroids,
exactly as FAISS seeds k-means from the first training points.  The
k-means-*trained* codebook variant lives in ``plans/llm_similarity.py``
(IVF with trained codebook) — training is iterative and stays
pytest/recall-pinned; the encode/ADC kernel here is the part with exact
cross-engine semantics, so it gets the full value-hash oracle.

Float determinism: coordinates are fixed-pointed once —
``floor(x·1e6 + 0.5)`` per element (the engine's standard trick, see
``plans/llm_quantize.py`` for why floor-plus-half beats round) — and
every distance after that is an INT64 sum of squared integer
differences: exact under any partitioning, any fold order, both
engines.  Headroom: coords < 0.6 ⇒ per-subspace dist < 2e13, ADC sum
< 2e14 ≪ 2^63.

Scale design (100 TB of vectors):

- the codebook (M·K_C rows) and the per-query ADC tables
  (|q|·M·K_C rows) are control-plane sized and broadcast — the vector
  corpus is never on the build side of any join.
- encoding shuffles (vec, subspace)-keyed rows once for the argmin
  group-by (map-side combine applies; at corpus scale this is the one
  full pass, equivalent to FAISS's add()).
- scoring touches codes only — |corpus|·M rows joined to the broadcast
  ADC table, then the per-query top-k window rides Catalyst's
  ``InferWindowGroupLimit`` partial limit (same pinned shape as
  ``embed_topk_cosine``), so the exchange carries O(queries·k) per
  partition, never |corpus|·|queries|.
- argmin is ``min(struct(dist, cid))`` — associative, deterministic
  (ties break toward the lowest centroid id), no window.

Reference parity: beyond-reference (LLM-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

EMB_DIM = 64
M_SUB = 8                     # subspaces
D_SUB = EMB_DIM // M_SUB      # dims per subspace
K_C = 16                      # centroids per subspace
N_QUERIES = 10                # vec_id < N_QUERIES are queries (repo-wide)
TOP_K = 10
SCALE = 1_000_000

# fixed-point element: exact in both engines (floor is IEEE-exact; +0.5
# makes it round-half-up without engine-specific round() tie policy)
_SV_S = (
    "transform(embedding, x -> "
    f"cast(floor(cast(x as double) * {SCALE}.0d + 0.5d) as bigint))"
)
_SQDIST_S = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "0L, (acc, v) -> acc + v)"
)


def _sv_duck(col: str) -> str:
    return (
        f"list_transform({col}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0 + 0.5) AS BIGINT))"
    )


def _sub_duck(sv: str) -> str:
    """Slice of a scaled 64-vector for subspace ``m`` (1-based lists)."""
    return (
        f"list_transform(range(1, {D_SUB} + 1), "
        f"i -> ({sv})[m * {D_SUB} + i])"
    )


_SQDIST_D = (
    "list_sum(list_transform(range(1, {n} + 1), "
    "i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i])))"
)


def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query top-``TOP_K`` candidates by PQ asymmetric distance."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_SV_S).alias("sv")
    )
    # one row per (vector, subspace) with the D_SUB-dim scaled slice
    sub = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(M_SUB - 1))).alias("m"),
        F.col("sv"),
    ).select(
        "vec_id", "m",
        F.expr(f"slice(sv, m * {D_SUB} + 1, {D_SUB})").alias("subv"),
    )

    cb = sub.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + K_C)
    ).select(F.col("vec_id").alias("cid"), "m", F.col("subv").alias("csub"))

    # encode: nearest centroid per (candidate, subspace); ties → low cid
    cand = sub.filter(F.col("vec_id") >= N_QUERIES).withColumnRenamed(
        "vec_id", "cand_id"
    )
    dist = _SQDIST_S.format(a="subv", b="csub")
    codes = (
        cand.join(F.broadcast(cb), "m")
        .select(
            "cand_id", "m",
            F.struct(F.expr(dist).alias("d"), F.col("cid").alias("c"))
            .alias("dc"),
        )
        .groupBy("cand_id", "m")
        .agg(F.min("dc").getField("c").alias("code"))
    )

    # per-query ADC lookup table: |q|·M·K_C rows, broadcast
    qsub = sub.filter(F.col("vec_id") < N_QUERIES).withColumnRenamed(
        "vec_id", "query_id"
    )
    qtab = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "m", "cid", F.expr(dist).alias("qdist")
    )

    adc = (
        codes.join(
            F.broadcast(qtab),
            (codes.m == qtab.m) & (codes.code == qtab.cid),
        )
        .groupBy("query_id", "cand_id")
        .agg(F.sum("qdist").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


_SV_Q = _sv_duck("embedding")
_D_ENC = _SQDIST_D.format(n=D_SUB, a="c.subv", b="k.csub")
_D_Q = _SQDIST_D.format(n=D_SUB, a="q.subv", b="k.csub")

PQ_ADC_ORACLE = f"""
WITH sub AS (
  SELECT vec_id, m, {_sub_duck(_SV_Q)} AS subv
  FROM embeddings, (SELECT unnest(range(0, {M_SUB})) AS m)
),
cb AS (
  SELECT vec_id AS cid, m, subv AS csub FROM sub
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + {K_C}
),
dists AS (
  SELECT c.vec_id AS cand_id, c.m, k.cid, {_D_ENC} AS d
  FROM sub c JOIN cb k USING (m)
  WHERE c.vec_id >= {N_QUERIES}
),
best AS (
  SELECT cand_id, m, MIN(d) AS md FROM dists GROUP BY cand_id, m
),
codes AS (
  SELECT d.cand_id, d.m, MIN(d.cid) AS code
  FROM dists d JOIN best b
    ON d.cand_id = b.cand_id AND d.m = b.m AND d.d = b.md
  GROUP BY d.cand_id, d.m
),
qtab AS (
  SELECT q.vec_id AS query_id, q.m, k.cid, {_D_Q} AS qdist
  FROM sub q JOIN cb k USING (m)
  WHERE q.vec_id < {N_QUERIES}
),
adc AS (
  SELECT t.query_id, c.cand_id, CAST(SUM(t.qdist) AS BIGINT) AS adc_dist
  FROM codes c JOIN qtab t ON t.m = c.m AND t.cid = c.code
  GROUP BY t.query_id, c.cand_id
),
ranked AS (
  SELECT query_id, cand_id, adc_dist,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY adc_dist, cand_id
         ) AS INTEGER) AS rank
  FROM adc
)
SELECT query_id, cand_id, adc_dist, rank FROM ranked WHERE rank <= {TOP_K}
"""


register(QuerySpec("pq_adc_topk", pq_adc_topk, PQ_ADC_ORACLE,
                   tags=("llm", "ann")))
