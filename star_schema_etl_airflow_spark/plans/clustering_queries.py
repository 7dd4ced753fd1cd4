"""Oracle-checked k-means clustering over the ``embeddings`` fixture.

Two full Lloyd iterations (assign → update → assign → update) with the
determinism contract of ``operators/kmeans.py``; the DuckDB oracle unrolls
the same two iterations as generated CTEs, so the differential check
covers an *iterative ML algorithm* end-to-end: init, distance fold,
tie-breaking, exact-decimal centroid means, and re-assignment.

``KMEANS_CTES`` ends with ``a2`` (assignment after the 2nd iteration) and
``c2`` (the trained codebook) — the trained-IVF oracle
(plans/llm_similarity.py) composes on top of ``c2``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from star_schema_etl_airflow_spark.operators.kmeans import kmeans_fit
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

K = 8
N_ITER = 2
EMB_DIM = 64


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assign, _ = kmeans_fit(emb, K, N_ITER)
    return assign


def _dist_d(c: str) -> str:
    diff = f"(CAST(v.embedding[i] AS DOUBLE) - CAST({c}.embedding[i] AS DOUBLE))"
    return (
        f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
        f"i -> {diff} * {diff}))"
    )


def _assign_cte(name: str, cent_table: str) -> str:
    return f"""{name} AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id ORDER BY {_dist_d('c')}, c.cluster) AS rn
    FROM embeddings v CROSS JOIN {cent_table} c
  ) WHERE rn = 1
)"""


def _update_ctes(i: int, assign_name: str) -> str:
    return f"""ex{i} AS (
  SELECT a.cluster, d.i AS dim, CAST(v.embedding[d.i] AS DOUBLE) AS val
  FROM embeddings v
  JOIN {assign_name} a USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, {EMB_DIM} + 1)) AS i) d
),
m{i} AS (
  SELECT cluster, dim,
         CAST(SUM(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
  FROM ex{i} GROUP BY 1, 2
),
c{i} AS (
  SELECT cluster, list(m ORDER BY dim) AS embedding FROM m{i} GROUP BY cluster
)"""


# CTE chain shared with the trained-IVF oracle (plans/llm_similarity.py):
# init → (assign → exploded dims → decimal-exact means → centroids) × 2.
KMEANS_CTES = f"""init AS (
  SELECT vec_id AS cluster, embedding
  FROM embeddings ORDER BY vec_id LIMIT {K}
),
{_assign_cte('a1', 'init')},
{_update_ctes(1, 'a1')},
{_assign_cte('a2', 'c1')},
{_update_ctes(2, 'a2')}"""

KMEANS_ASSIGN_ORACLE = f"""
WITH {KMEANS_CTES}
SELECT vec_id, cluster FROM a2
"""

register(QuerySpec("kmeans_assign", kmeans_assign, KMEANS_ASSIGN_ORACLE,
                   headline=True, tags=("KMEANS",)))
