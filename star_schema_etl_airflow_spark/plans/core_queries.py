"""Core-layer oracle-checked queries: full SCD2 application, the fact
builder with PIT-resolved keys, and the composite-key MERGE upsert.

These are the reference's semantic heart (dim_customers.sql, fact_orders.sql)
re-expressed set-based; each has a complete ANSI-SQL oracle so the driver
checks the *whole* algorithm, not just fragments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.merge import merge_upsert
from star_schema_etl_airflow_spark.operators.scd2 import apply_scd2
from star_schema_etl_airflow_spark.plans.dims import (
    SCD2_CUSTOMER_DIM_SQL,
    synthetic_scd2_customer_dim,
)
from star_schema_etl_airflow_spark.plans.facts import (
    FACT_ORDERS_ORACLE,
    fact_orders,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

# --- SCD2 apply: one day's slice against the synthetic dimension -----------

SCD2_RUN_DATE = "1999-06-01"


def _scd2_source_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic daily slice: ~25% changed rows, some brand-new keys,
    plus same-key duplicates (stale version) to exercise the dedupe rule."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.when(F.col("c_custkey") % 4 == 1, F.col("c_acctbal") + 250.0)
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
        F.lit(2).alias("src_version"),
    )
    stale_dups = c.filter(F.col("c_custkey") % 50 == 0).select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
        (F.col("c_acctbal") - 99.0).alias("acctbal"),
        F.lit(1).alias("src_version"),
    )
    brand_new = c.filter(F.col("c_custkey") % 20 == 0).select(
        (F.col("c_custkey") + 2000000).alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit(2).alias("src_version"),
    )
    return base.unionByName(stale_dups).unionByName(brand_new)


def scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = synthetic_scd2_customer_dim(spark, sf_dir)
    src = _scd2_source_slice(spark, sf_dir)
    return apply_scd2(
        dim,
        src,
        key="customer_id",
        tracked=["customer_name", "mktsegment", "acctbal"],
        run_date=SCD2_RUN_DATE,
        sk_col="customer_sk",
        order_col="src_version",
    )


SCD2_APPLY_ORACLE = f"""
WITH dim AS ({SCD2_CUSTOMER_DIM_SQL}),
src_raw AS (
  SELECT c_custkey AS customer_id, c_name AS customer_name,
         c_mktsegment AS mktsegment,
         CASE WHEN c_custkey % 4 = 1 THEN c_acctbal + 250.0 ELSE c_acctbal END AS acctbal,
         2 AS src_version
  FROM customer
  UNION ALL
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal - 99.0, 1
  FROM customer WHERE c_custkey % 50 = 0
  UNION ALL
  SELECT c_custkey + 2000000, c_name, c_mktsegment, c_acctbal, 2
  FROM customer WHERE c_custkey % 20 = 0
),
src AS (
  SELECT customer_id, customer_name, mktsegment, acctbal FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY customer_id ORDER BY src_version DESC) AS rn
    FROM src_raw
  ) WHERE rn = 1
),
cur AS (SELECT * FROM dim WHERE is_current),
cls AS (
  SELECT s.*,
         CASE WHEN t.customer_id IS NULL THEN 'new'
              WHEN (t.customer_name IS DISTINCT FROM s.customer_name)
                OR (t.mktsegment    IS DISTINCT FROM s.mktsegment)
                OR (t.acctbal       IS DISTINCT FROM s.acctbal) THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM src s LEFT JOIN cur t ON s.customer_id = t.customer_id
),
changed_keys AS (SELECT customer_id FROM cls WHERE change_type = 'changed'),
carried AS (
  SELECT d.customer_sk, d.customer_id, d.customer_name, d.mktsegment, d.acctbal,
         d.effective_date,
         CASE WHEN d.is_current AND k.customer_id IS NOT NULL
              THEN DATE '{SCD2_RUN_DATE}' ELSE d.expiration_date END AS expiration_date,
         CASE WHEN d.is_current AND k.customer_id IS NOT NULL
              THEN FALSE ELSE d.is_current END AS is_current
  FROM dim d LEFT JOIN changed_keys k ON d.customer_id = k.customer_id
),
inserted AS (
  SELECT CAST((SELECT COALESCE(MAX(customer_sk), 0) FROM dim)
              + ROW_NUMBER() OVER (ORDER BY customer_id) AS BIGINT) AS customer_sk,
         customer_id, customer_name, mktsegment, acctbal,
         DATE '{SCD2_RUN_DATE}' AS effective_date,
         CAST(NULL AS DATE) AS expiration_date,
         TRUE AS is_current
  FROM cls WHERE change_type <> 'unchanged'
)
SELECT * FROM carried UNION ALL SELECT * FROM inserted
"""

# --- S7/J6: composite-key MERGE upsert --------------------------------------


def s7_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    target = li.filter(F.col("l_linenumber") <= 4).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_returnflag").alias("returnflag"),
    )
    source = li.filter(F.col("l_quantity") >= 30).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") + 100).alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.lit("U").alias("returnflag"),
    )
    return merge_upsert(target, source, keys=["l_orderkey", "l_linenumber"])


S7_MERGE_ORACLE = """
WITH target AS (
  SELECT l_orderkey, l_linenumber, l_quantity AS quantity,
         l_extendedprice AS extendedprice, l_returnflag AS returnflag
  FROM lineitem WHERE l_linenumber <= 4
),
src AS (
  SELECT l_orderkey, l_linenumber, l_quantity + 100 AS quantity,
         l_extendedprice AS extendedprice, 'U' AS returnflag
  FROM lineitem WHERE l_quantity >= 30
)
SELECT t.* FROM target t
WHERE NOT EXISTS (SELECT 1 FROM src s
                  WHERE s.l_orderkey = t.l_orderkey
                    AND s.l_linenumber = t.l_linenumber)
UNION ALL
SELECT * FROM src
"""

# --- registrations ----------------------------------------------------------

register(QuerySpec(
    "scd2_apply", scd2_apply, SCD2_APPLY_ORACLE, headline=True,
    tags=("S7", "S10", "J3", "J5", "P5", "P8", "W1", "A5"),
))
register(QuerySpec(
    "fact_orders", fact_orders, FACT_ORDERS_ORACLE, headline=True,
    tags=("J1", "J2", "J6", "P1"),
))
register(QuerySpec(
    "s7_merge_upsert", s7_merge_upsert, S7_MERGE_ORACLE,
    tags=("S7", "J6"),
))
