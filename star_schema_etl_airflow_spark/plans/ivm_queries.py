"""Differential check for incremental view maintenance
(``operators/ivm.py``): maintain the sales rollup through two delta
batches and require the result to EQUAL a from-scratch recompute — the
oracle is the direct SQL over the base tables, so any drift between the
incremental fold and the full aggregate is a hash mismatch.

The batch split is by order date (history < SPLIT_DATE <= delta), the
same boundary the reference's per-date refresh uses; the second batch
deliberately touches groups the first batch already created (multi-line
orders split across batches by line number) to exercise the
within-group merge, not just partition append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.ivm import (
    grain_to_summary,
    merge_grain,
    sales_grain_partials,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SPLIT_DATE = "1998-01-01"


def ivm_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
        "l_extendedprice",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")

    old_orders = orders.filter(F.col("o_orderdate") < SPLIT_DATE)
    new_orders = orders.filter(F.col("o_orderdate") >= SPLIT_DATE)

    # batch 1: all history lines, plus only the odd line numbers of the
    # delta dates; batch 2: the even line numbers of the delta dates —
    # so batch 2 merges INTO (date, category, order) groups batch 1
    # already materialized.
    state = sales_grain_partials(
        li.join(old_orders.select("o_orderkey"), li["l_orderkey"] == F.col("o_orderkey"), "left_semi")
        .unionByName(
            li.filter(F.col("l_linenumber") % 2 == 1)
            .join(new_orders.select("o_orderkey"),
                  li["l_orderkey"] == F.col("o_orderkey"), "left_semi")
        ),
        orders, part,
    )
    delta = sales_grain_partials(
        li.filter(F.col("l_linenumber") % 2 == 0)
        .join(new_orders.select("o_orderkey"),
              li["l_orderkey"] == F.col("o_orderkey"), "left_semi"),
        orders, part,
    )
    return grain_to_summary(merge_grain(state, delta))


IVM_ORACLE = """
SELECT CAST(o.o_orderdate AS DATE) AS sale_date,
       p.p_type AS product_category,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
            AS DECIMAL(38,2)) AS DOUBLE) AS total_sales,
       COUNT(DISTINCT l.l_orderkey) AS total_orders,
       CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
            AS DECIMAL(38,2)) AS DOUBLE) AS total_quantity
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p   ON p.p_partkey = l.l_partkey
GROUP BY 1, 2
"""

register(QuerySpec("ivm_sales_summary", ivm_sales_summary, IVM_ORACLE,
                   tags=("IVM", "A1", "A2", "A3")))
