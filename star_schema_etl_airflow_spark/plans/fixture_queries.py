"""All oracle-checked query registrations over the driver fixtures.

One entry per operator family of SURVEY.md §2 (tags cite the operator ids).
This module only *registers* — the implementations live in the plans/,
operators/ and functions/ modules.
"""

from __future__ import annotations

from star_schema_etl_airflow_spark.plans import datamart
from star_schema_etl_airflow_spark.registry import QuerySpec, register

register(QuerySpec(
    name="sales_summary",
    fn=datamart.sales_summary,
    oracle=datamart.SALES_SUMMARY_ORACLE,
    headline=True,
    tags=("J1", "J4", "A1", "A2", "A3", "A6", "P1"),
))

register(QuerySpec(
    name="customer_analytics",
    fn=datamart.customer_analytics,
    oracle=datamart.CUSTOMER_ANALYTICS_ORACLE,
    headline=True,
    tags=("J1", "J4", "A1", "A3", "A4", "A6", "P6"),
))


def profile_lineitem(spark, sf_dir):
    """Single-scan profile of lineitem (operators/profile.py): null
    counts, exact NDV, min/max for three numeric and two string columns."""
    from star_schema_etl_airflow_spark.operators.profile import profile
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    return profile(
        load_table(spark, sf_dir, "lineitem"),
        numeric_cols=["l_orderkey", "l_quantity", "l_extendedprice"],
        string_cols=["l_returnflag", "l_linestatus"],
    )


PROFILE_LINEITEM_ORACLE = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem)
SELECT u.*, n.n_rows FROM n, (
  SELECT 'l_orderkey' AS "column",
         SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS n_nulls,
         COUNT(DISTINCT l_orderkey) AS ndv,
         CAST(MIN(l_orderkey) AS DOUBLE) AS min_num,
         CAST(MAX(l_orderkey) AS DOUBLE) AS max_num,
         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
  FROM lineitem
  UNION ALL
  SELECT 'l_quantity',
         SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT l_quantity),
         CAST(MIN(l_quantity) AS DOUBLE), CAST(MAX(l_quantity) AS DOUBLE),
         NULL, NULL
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice',
         SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT l_extendedprice),
         CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
         NULL, NULL
  FROM lineitem
  UNION ALL
  SELECT 'l_returnflag',
         SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT l_returnflag),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         MIN(l_returnflag), MAX(l_returnflag)
  FROM lineitem
  UNION ALL
  SELECT 'l_linestatus',
         SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT l_linestatus),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         MIN(l_linestatus), MAX(l_linestatus)
  FROM lineitem
) u
"""

register(QuerySpec("profile_lineitem", profile_lineitem,
                   PROFILE_LINEITEM_ORACLE, tags=("profiling", "A3", "A4")))
