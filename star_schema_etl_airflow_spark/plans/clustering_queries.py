"""Oracle-checked k-means clustering over the ``embeddings`` fixture.

Two full Lloyd iterations (assign → update → assign → update) with the
determinism contract of ``operators/kmeans.py``; the DuckDB oracle unrolls
the same two iterations as CTEs, so the differential check covers an
*iterative ML algorithm* end-to-end: init, distance fold, tie-breaking,
exact-decimal centroid means, and re-assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


KMEANS_ASSIGN_ORACLE = f"""
WITH init AS (
  SELECT vec_id AS cluster, embedding
  FROM embeddings ORDER BY vec_id LIMIT {K}
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id ORDER BY {_dist_d('c')}, c.cluster) AS rn
    FROM embeddings v CROSS JOIN init c
  ) WHERE rn = 1
),
ex1 AS (
  SELECT a.cluster, d.i AS dim, CAST(v.embedding[d.i] AS DOUBLE) AS val
  FROM embeddings v
  JOIN a1 a USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, {EMB_DIM} + 1)) AS i) d
),
m1 AS (
  SELECT cluster, dim,
         CAST(SUM(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
  FROM ex1 GROUP BY 1, 2
),
c1 AS (
  SELECT cluster, list(m ORDER BY dim) AS embedding FROM m1 GROUP BY cluster
)
SELECT vec_id, cluster FROM (
  SELECT v.vec_id, c.cluster,
         ROW_NUMBER() OVER (
           PARTITION BY v.vec_id ORDER BY {_dist_d('c')}, c.cluster) AS rn
  FROM embeddings v CROSS JOIN c1 c
) WHERE rn = 1
"""

register(QuerySpec("kmeans_assign", kmeans_assign, KMEANS_ASSIGN_ORACLE,
                   headline=True, tags=("KMEANS",)))
