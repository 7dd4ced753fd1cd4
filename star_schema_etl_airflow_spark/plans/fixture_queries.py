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
         CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         COUNT(DISTINCT l_orderkey) AS ndv,
         CAST(MIN(l_orderkey) AS DOUBLE) AS min_num,
         CAST(MAX(l_orderkey) AS DOUBLE) AS max_num,
         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
  FROM lineitem
  UNION ALL
  SELECT 'l_quantity',
         CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT l_quantity),
         CAST(MIN(l_quantity) AS DOUBLE), CAST(MAX(l_quantity) AS DOUBLE),
         NULL, NULL
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice',
         CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT l_extendedprice),
         CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
         NULL, NULL
  FROM lineitem
  UNION ALL
  SELECT 'l_returnflag',
         CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT l_returnflag),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         MIN(l_returnflag), MAX(l_returnflag)
  FROM lineitem
  UNION ALL
  SELECT 'l_linestatus',
         CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT l_linestatus),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         MIN(l_linestatus), MAX(l_linestatus)
  FROM lineitem
) u
"""

register(QuerySpec("profile_lineitem", profile_lineitem,
                   PROFILE_LINEITEM_ORACLE, tags=("profiling", "A3", "A4")))


def ri_audit(spark, sf_dir):
    """Referential-integrity audit across the star schema: orphan counts
    for each FK edge as one long-format result (anti-join counts — the
    complement of the row-level quality gate in operators/quality.py).
    Each edge is an independent left-anti join; Catalyst broadcasts the
    small key sides."""
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def orphans(name, child, child_key, parent, parent_key):
        n = (
            child.join(
                parent.select(parent_key),
                child[child_key] == parent[parent_key],
                "left_anti",
            ).count()
        )
        total = child.count()
        return (name, n, total)

    rows = [
        orphans("lineitem.l_orderkey -> orders", li, "l_orderkey", orders, "o_orderkey"),
        orphans("lineitem.l_suppkey -> supplier", li, "l_suppkey", supp, "s_suppkey"),
        orphans("orders.o_custkey -> customer", orders, "o_custkey", cust, "c_custkey"),
        orphans("customer.c_nationkey -> nation", cust, "c_nationkey", nation, "n_nationkey"),
    ]
    return spark.createDataFrame(
        rows, "fk_edge string, n_orphans long, n_rows long"
    )


RI_AUDIT_ORACLE = """
SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
       (SELECT COUNT(*) FROM lineitem) AS n_rows
UNION ALL
SELECT 'lineitem.l_suppkey -> supplier',
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'orders.o_custkey -> customer',
       (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'customer.c_nationkey -> nation',
       (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
         (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
       (SELECT COUNT(*) FROM customer)
"""

register(QuerySpec("ri_audit", ri_audit, RI_AUDIT_ORACLE,
                   tags=("DQ1", "J7")))


def profile_documents(spark, sf_dir):
    """Dataset-card profile of the documents corpus (the data statement
    a training-data release ships with): null counts, exact NDV, and
    min/max for the length column and both categorical columns — one
    scan per column group via operators/profile.py, aggregation-only
    (no joins), any corpus size."""
    from star_schema_etl_airflow_spark.operators.profile import profile
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    return profile(
        load_table(spark, sf_dir, "documents"),
        numeric_cols=["doc_id", "n_chars"],
        string_cols=["lang", "source"],
    )


PROFILE_DOCUMENTS_ORACLE = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM documents)
SELECT u.*, n.n_rows FROM n, (
  SELECT 'doc_id' AS "column",
         CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         COUNT(DISTINCT doc_id) AS ndv,
         CAST(MIN(doc_id) AS DOUBLE) AS min_num,
         CAST(MAX(doc_id) AS DOUBLE) AS max_num,
         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
  FROM documents
  UNION ALL
  SELECT 'n_chars',
         CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT n_chars),
         CAST(MIN(n_chars) AS DOUBLE), CAST(MAX(n_chars) AS DOUBLE),
         NULL, NULL
  FROM documents
  UNION ALL
  SELECT 'lang',
         CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT lang),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         MIN(lang), MAX(lang)
  FROM documents
  UNION ALL
  SELECT 'source',
         CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT source),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         MIN(source), MAX(source)
  FROM documents
) u
"""

register(QuerySpec("profile_documents", profile_documents,
                   PROFILE_DOCUMENTS_ORACLE, tags=("profiling", "A3", "A4")))
