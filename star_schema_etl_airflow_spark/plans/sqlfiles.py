"""Oracle checks for the committed reference-parity SQL script tree.

The reference's entire user surface is SQL files resolved by convention
and executed by an operator (utils/operators.py:93-159 +
utils/sql_utils.py:7-61).  ``sql/`` in this repo mirrors that tree with
Spark-SQL ports of all six transforms (bug-fixed semantics per
SURVEY.md §2.11); each query here executes one committed file through
the real S3/S4/S5 machinery (``sql_path`` → ``run_sql_file`` →
``{{param}}`` splicing) and is checked against the SAME oracle as the
equivalent DataFrame query — proving a reference user could drop their
SQL-file workflow onto this engine end-to-end.

Scale note: a SQL string compiles to the same Catalyst plan as the
DataFrame API; where the file keeps the reference's verbatim shape
while the DataFrame twin ships a measured-faster plan (sales_summary's
pre-aggregated form), the file's header says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.core_queries import (
    SCD2_APPLY_ORACLE,
    SCD2_RUN_DATE,
    _scd2_source_slice,
)
from star_schema_etl_airflow_spark.plans.datamart import (
    CUSTOMER_ANALYTICS_ORACLE,
    RUN_DATE,
    SALES_SUMMARY_ORACLE,
)
from star_schema_etl_airflow_spark.plans.dims import (
    synthetic_scd2_customer_dim,
)
from star_schema_etl_airflow_spark.plans.facts import (
    FACT_ORDERS_ORACLE,
    PRODUCT_DIM_SQL,
    product_dim,
)
from star_schema_etl_airflow_spark.plans.operators_basic import (
    G1_END,
    G1_ORACLE,
    G1_START,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.sources.sql_exec import (
    SQL_ROOT,
    register_views,
    run_sql_file,
    sql_path,
)
from star_schema_etl_airflow_spark.sources.sql_script import (
    run_sql_script_file,
)

# Full fixture envelope (o_orderdate spans 1995-01-01..2001-08-01 at
# every sf): dstart/dend cover everything so the file's partition-bound
# refresh matches the whole-table oracle; dstart = dend would reproduce
# the reference's single-date refresh.
FULL_RANGE = {"dstart": "1992-01-01", "dend": "2005-12-31"}


def sqlfile_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return run_sql_file(
        spark,
        sql_path(SQL_ROOT, "datamart", "sales_summary", domain="sales"),
        params=FULL_RANGE,
    )


def sqlfile_customer_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return run_sql_file(
        spark,
        sql_path(SQL_ROOT, "datamart", "customer_analytics", domain="sales"),
        params={"dstart": RUN_DATE},
    )


def sqlfile_dim_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql_file(
        spark,
        sql_path(SQL_ROOT, "core", "dim_dates", table_type="dim"),
        params={"dstart": G1_START, "dend": G1_END},
    )


def sqlfile_fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    synthetic_scd2_customer_dim(spark, sf_dir).createOrReplaceTempView(
        "sqlv_dim_customers")
    product_dim(spark, sf_dir).createOrReplaceTempView("sqlv_dim_products")
    return run_sql_file(
        spark,
        sql_path(SQL_ROOT, "core", "fact_orders", table_type="fact"),
        params={"dim_customers": "sqlv_dim_customers",
                "dim_products": "sqlv_dim_products", **FULL_RANGE},
    )


def sqlfile_dim_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    synthetic_scd2_customer_dim(spark, sf_dir).createOrReplaceTempView(
        "sqlv_dim_customers_state")
    _scd2_source_slice(spark, sf_dir).createOrReplaceTempView(
        "sqlv_staging_customers")
    return run_sql_file(
        spark,
        sql_path(SQL_ROOT, "core", "dim_customers", table_type="dim"),
        params={"dim_view": "sqlv_dim_customers_state",
                "staging_view": "sqlv_staging_customers",
                "run_date": SCD2_RUN_DATE},
    )


def sqlscript_dim_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same SCD2 apply as ``sqlfile_dim_customers``, but through the
    reference's VERBATIM multi-statement script shape (DECLARE; MERGE;
    INSERT; SELECT — sql/core/dim/dim_customers_script.sql) executed by
    the sql_script runner.  Checked against the same set-based oracle:
    the two execution paths must agree row-for-row."""
    synthetic_scd2_customer_dim(spark, sf_dir).createOrReplaceTempView(
        "sqlv_dim_customers_script_state")
    _scd2_source_slice(spark, sf_dir).createOrReplaceTempView(
        "sqlv_staging_customers_script")
    return run_sql_script_file(
        spark,
        sql_path(SQL_ROOT, "core", "dim_customers_script", table_type="dim"),
        params={"dim_view": "sqlv_dim_customers_script_state",
                "staging_view": "sqlv_staging_customers_script",
                "run_date": SCD2_RUN_DATE},
    )


def sqlscript_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's DELETE+INSERT partition refresh (S8) in its
    verbatim two-statement script shape.  The summary view starts with
    stale rows INSIDE the refresh window (wrong totals — the DELETE
    must remove them) so the oracle match proves both statements ran."""
    register_views(spark, sf_dir)
    stale = spark.createDataFrame(
        [("1996-03-15", 1996, 3, "March", "STALE CATEGORY",
          -1.0, 0, -1.0, None),
         ("1998-07-01", 1998, 7, "July", "STALE CATEGORY",
          -2.0, 0, -2.0, None)],
        "sale_date STRING, year INT, month INT, month_name STRING, "
        "product_category STRING, total_sales DOUBLE, total_orders BIGINT, "
        "total_quantity DOUBLE, avg_order_value DOUBLE",
    ).withColumn("sale_date", F.col("sale_date").cast("date"))
    stale.createOrReplaceTempView("sqlv_sales_summary_script_state")
    return run_sql_script_file(
        spark,
        sql_path(SQL_ROOT, "datamart", "sales_summary_script",
                 domain="sales"),
        params={"summary_view": "sqlv_sales_summary_script_state",
                **FULL_RANGE},
    )


def sqlscript_dim_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's single-MERGE date-dimension refresh in verbatim
    script shape.  The target starts with one STALE in-range row (wrong
    month_name / flipped is_weekend) so the oracle match proves the
    WHEN MATCHED update branch ran, not just the inserts."""
    stale = run_sql_file(
        spark,
        sql_path(SQL_ROOT, "core", "dim_dates", table_type="dim"),
        params={"dstart": G1_START, "dend": G1_START},
    ).withColumn("month_name", F.lit("STALE")) \
     .withColumn("is_weekend", ~F.col("is_weekend"))
    stale.createOrReplaceTempView("sqlv_dim_dates_script_state")
    return run_sql_script_file(
        spark,
        sql_path(SQL_ROOT, "core", "dim_dates_script", table_type="dim"),
        params={"dim_view": "sqlv_dim_dates_script_state",
                "dstart": G1_START, "dend": G1_END},
    )


def sqlscript_fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's composite-key fact MERGE (J6) in verbatim script
    shape.  The target starts with a corrupted slice of the true
    (deduped — see the script header) fact: every ~97th order has
    quantity/item_amount off by +999, so the MERGE must UPDATE those
    lines back and INSERT the rest for the oracle to match."""
    from pyspark.sql import Window

    register_views(spark, sf_dir)
    synthetic_scd2_customer_dim(spark, sf_dir).createOrReplaceTempView(
        "sqlv_dim_customers_fscript")
    product_dim(spark, sf_dir).createOrReplaceTempView(
        "sqlv_dim_products_fscript")
    w = Window.partitionBy("order_id", "order_item_id").orderBy(
        "product_id", "item_amount", "quantity", "unit_price",
        "customer_sk", "product_sk")
    stale = sqlfile_fact_orders(spark, sf_dir) \
        .withColumn("__rn", F.row_number().over(w)) \
        .filter(F.col("__rn") == 1).drop("__rn") \
        .filter(F.col("order_id") % 97 == 0) \
        .withColumn("quantity", F.col("quantity") + 999.0) \
        .withColumn("item_amount", F.col("item_amount") + 999.0)
    stale.createOrReplaceTempView("sqlv_fact_orders_script_state")
    return run_sql_script_file(
        spark,
        sql_path(SQL_ROOT, "core", "fact_orders_script", table_type="fact"),
        params={"fact_view": "sqlv_fact_orders_script_state",
                "dim_customers": "sqlv_dim_customers_fscript",
                "dim_products": "sqlv_dim_products_fscript",
                **FULL_RANGE},
    )


def sqlscript_customer_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's DELETE-WHERE-TRUE + INSERT full refresh (S9) in
    verbatim script shape; the target starts with stale rows that the
    DELETE must remove."""
    register_views(spark, sf_dir)
    stale = sqlfile_customer_analytics(spark, sf_dir).limit(5) \
        .withColumn("customer_segment", F.lit("STALE"))
    stale.createOrReplaceTempView("sqlv_customer_analytics_script_state")
    return run_sql_script_file(
        spark,
        sql_path(SQL_ROOT, "datamart", "customer_analytics_script",
                 domain="sales"),
        params={"analytics_view": "sqlv_customer_analytics_script_state",
                "dstart": RUN_DATE},
    )


def _product_staging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic product staging slice: ~1/7 price changes plus some
    brand-new product ids (the reference's raw products slice)."""
    p = load_table(spark, sf_dir, "part")
    base = p.select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_type").alias("category"),
        F.when(F.col("p_partkey") % 7 == 2, F.col("p_retailprice") + 10.0)
        .otherwise(F.col("p_retailprice"))
        .alias("price"),
    )
    brand_new = p.filter(F.col("p_partkey") % 13 == 0).select(
        (F.col("p_partkey") + 9000000).alias("product_id"),
        F.col("p_type").alias("category"),
        F.col("p_retailprice").alias("price"),
    )
    return base.unionByName(brand_new)


def sqlfile_dim_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    product_dim(spark, sf_dir).createOrReplaceTempView(
        "sqlv_dim_products_state")
    _product_staging(spark, sf_dir).createOrReplaceTempView(
        "sqlv_staging_products")
    return run_sql_file(
        spark,
        sql_path(SQL_ROOT, "core", "dim_products", table_type="dim"),
        params={"dim_view": "sqlv_dim_products_state",
                "staging_view": "sqlv_staging_products",
                "run_date": SCD2_RUN_DATE},
    )


DIM_PRODUCTS_ORACLE = f"""
WITH dim AS ({PRODUCT_DIM_SQL}),
src AS (
  SELECT p_partkey AS product_id, p_type AS category,
         CASE WHEN p_partkey % 7 = 2 THEN p_retailprice + 10.0
              ELSE p_retailprice END AS price
  FROM part
  UNION ALL
  SELECT p_partkey + 9000000, p_type, p_retailprice
  FROM part WHERE p_partkey % 13 = 0
),
cur AS (SELECT * FROM dim WHERE is_current),
cls AS (
  SELECT s.*,
         CASE WHEN t.product_id IS NULL THEN 'new'
              WHEN (t.category IS DISTINCT FROM s.category)
                OR (t.price    IS DISTINCT FROM s.price) THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM src s LEFT JOIN cur t ON s.product_id = t.product_id
),
changed_keys AS (SELECT product_id FROM cls WHERE change_type = 'changed'),
carried AS (
  SELECT d.product_sk, d.product_id, d.category, d.price,
         d.effective_date,
         CASE WHEN d.is_current AND k.product_id IS NOT NULL
              THEN DATE '{SCD2_RUN_DATE}' ELSE d.expiration_date END AS expiration_date,
         CASE WHEN d.is_current AND k.product_id IS NOT NULL
              THEN FALSE ELSE d.is_current END AS is_current
  FROM dim d LEFT JOIN changed_keys k ON d.product_id = k.product_id
),
inserted AS (
  SELECT CAST((SELECT COALESCE(MAX(product_sk), 0) FROM dim)
              + ROW_NUMBER() OVER (ORDER BY product_id) AS BIGINT) AS product_sk,
         product_id, category, price,
         DATE '{SCD2_RUN_DATE}' AS effective_date,
         CAST(NULL AS DATE) AS expiration_date,
         TRUE AS is_current
  FROM cls WHERE change_type <> 'unchanged'
)
SELECT * FROM carried UNION ALL SELECT * FROM inserted
"""


def sqlscript_dim_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's DECLARE; MERGE; INSERT product-dimension script
    job in verbatim shape (dim_products_script.sql), same oracle as the
    single-SELECT file port."""
    product_dim(spark, sf_dir).createOrReplaceTempView(
        "sqlv_dim_products_script_state")
    _product_staging(spark, sf_dir).createOrReplaceTempView(
        "sqlv_staging_products_script")
    return run_sql_script_file(
        spark,
        sql_path(SQL_ROOT, "core", "dim_products_script", table_type="dim"),
        params={"dim_view": "sqlv_dim_products_script_state",
                "staging_view": "sqlv_staging_products_script",
                "run_date": SCD2_RUN_DATE},
    )


register(QuerySpec("sqlfile_sales_summary", sqlfile_sales_summary,
                   SALES_SUMMARY_ORACLE, tags=("S3", "S4", "S5")))
register(QuerySpec("sqlfile_customer_analytics", sqlfile_customer_analytics,
                   CUSTOMER_ANALYTICS_ORACLE, tags=("S3", "S4", "S5")))
register(QuerySpec("sqlfile_dim_dates", sqlfile_dim_dates,
                   G1_ORACLE, tags=("S3", "S4", "S5", "G1")))
register(QuerySpec("sqlfile_fact_orders", sqlfile_fact_orders,
                   FACT_ORDERS_ORACLE, tags=("S3", "S4", "S5", "J1", "J2")))
register(QuerySpec("sqlfile_dim_customers", sqlfile_dim_customers,
                   SCD2_APPLY_ORACLE, tags=("S3", "S4", "S5", "P5", "W1", "A5")))
register(QuerySpec("sqlscript_dim_customers", sqlscript_dim_customers,
                   SCD2_APPLY_ORACLE,
                   tags=("S3", "S4", "S5", "S7", "S10", "J5", "P5", "W1", "A5")))
register(QuerySpec("sqlscript_sales_summary", sqlscript_sales_summary,
                   SALES_SUMMARY_ORACLE,
                   tags=("S3", "S4", "S5", "S8", "S10")))
register(QuerySpec("sqlscript_dim_products", sqlscript_dim_products,
                   DIM_PRODUCTS_ORACLE,
                   tags=("S3", "S4", "S5", "S7", "S10", "J5", "P5", "W1", "A5")))
register(QuerySpec("sqlscript_dim_dates", sqlscript_dim_dates,
                   G1_ORACLE, tags=("S3", "S4", "S5", "S7", "G1")))
# ANSI MERGE needs one source row per composite key; the fixture's
# line key is not unique, so the script (and this oracle) dedupe with
# the same deterministic tie-break (script header explains).
FACT_ORDERS_DEDUP_ORACLE = f"""
WITH fact AS ({FACT_ORDERS_ORACLE})
SELECT order_id, order_date, customer_sk, order_amount, quantity,
       order_item_id, product_id, product_sk, unit_price, item_amount,
       status
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY order_id, order_item_id
    ORDER BY product_id, item_amount, quantity, unit_price,
             customer_sk, product_sk) AS rn
  FROM fact
) WHERE rn = 1
"""

register(QuerySpec("sqlscript_fact_orders", sqlscript_fact_orders,
                   FACT_ORDERS_DEDUP_ORACLE,
                   tags=("S3", "S4", "S5", "S7", "J1", "J2", "J6")))
register(QuerySpec("sqlscript_customer_analytics",
                   sqlscript_customer_analytics,
                   CUSTOMER_ANALYTICS_ORACLE,
                   tags=("S3", "S4", "S5", "S9", "S10")))
register(QuerySpec("sqlfile_dim_products", sqlfile_dim_products,
                   DIM_PRODUCTS_ORACLE, tags=("S3", "S4", "S5", "P5", "W1", "A5")))
