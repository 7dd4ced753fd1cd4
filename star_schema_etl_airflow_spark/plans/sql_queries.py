"""Registered query exercising the SQL execution surface (S3/S4/S5):
the same engine capabilities through ``spark.sql`` with template
substitution and native named-parameter binding."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.sql_exec import register_views, run_sql

START, END = "1996-01-01", "1996-12-31"

# {{table}} is an identifier template (S4 string splice); :start/:end are
# value parameters bound natively (injection-safe).
PARAM_SQL = """
SELECT cast(o_orderdate as date)         AS order_date,
       o_orderpriority                   AS priority,
       count(*)                          AS n_orders,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue
FROM {{table}}
WHERE cast(o_orderdate as date) BETWEEN cast(:start as date) AND cast(:end as date)
GROUP BY 1, 2
"""


def s3_sql_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return run_sql(
        spark,
        PARAM_SQL,
        params={"table": "orders"},
        args={"start": START, "end": END},
    )


S3_ORACLE = f"""
SELECT CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority           AS priority,
       COUNT(*)                  AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{START}' AND DATE '{END}'
GROUP BY 1, 2
"""

register(QuerySpec("s3_sql_exec", s3_sql_exec, S3_ORACLE, tags=("S3", "S4", "S5")))


# --- Recursive CTE (Spark 4 WITH RECURSIVE) --------------------------------

# Hierarchy walk over the implicit binary tree on customer keys
# (parent(k) = k DIV 2): per customer, the depth to the root and the sum
# of every node on the path.  Exercises iterative UNION ALL recursion —
# the SQL-level twin of the localCheckpoint-per-round iterative operators
# (k-means, connected components).
#
# Scale: each recursion round is one map-side transform + union; rounds
# are bounded by log2(max key) (~47 for int64 keys), and each round's
# frontier shrinks as walks terminate — no shuffle inside the loop, one
# hash aggregate at the end.
REC_SQL = """
WITH RECURSIVE walk(customer_id, node, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT customer_id, node DIV 2, depth + 1 FROM walk WHERE node > 1
)
SELECT customer_id,
       CAST(max(depth) AS INT)   AS depth_to_root,
       CAST(sum(node) AS BIGINT) AS path_sum
FROM walk
GROUP BY customer_id
"""


def rec_hierarchy_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return run_sql(spark, REC_SQL)


REC_ORACLE = """
WITH RECURSIVE walk(customer_id, node, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT customer_id, node // 2, depth + 1 FROM walk WHERE node > 1
)
SELECT customer_id,
       CAST(max(depth) AS INTEGER) AS depth_to_root,
       CAST(sum(node) AS BIGINT)   AS path_sum
FROM walk
GROUP BY customer_id
"""

register(QuerySpec("rec_hierarchy_walk", rec_hierarchy_walk, REC_ORACLE,
                   tags=("S3", "G1")))
