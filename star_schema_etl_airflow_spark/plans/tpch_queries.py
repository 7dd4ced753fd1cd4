"""Classic TPC-H query shapes over the fixture star schema — breadth
beyond the reference's GROUP-BY ceiling, exercising multi-way join trees
(Q7), group-filter semi-join-back (Q18), and scalar-subquery + anti-join
(Q22 shape, adapted: fixtures carry no ``c_phone``, so the country-code
substring becomes the market segment and the "no orders" predicate stays).

Scale design notes:
- Q7: the join tree is fact (lineitem) ⋈ orders ⋈ customer ⋈ supplier
  with two broadcast nation dims.  Catalyst reorders the big joins;
  both nation joins are explicit broadcasts (25 rows at any SF).
- Q18: the HAVING filter runs as a partial-agg-friendly hash aggregate
  on l_orderkey BEFORE joining back to orders/customer, so only the
  filtered group keys reach the join — at 100 TB the aggregate output
  (orders over the quantity threshold) is tiny relative to lineitem.
- Q22 shape: the scalar AVG is a single-row aggregate broadcast via
  crossJoin (no ``.collect()`` driver round-trip); the "has no orders"
  test is a left-anti join (no row explosion, null-safe by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions import safe_divide
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

# Decimal-exact per-row revenue.  The product is an arbitrary double, so a
# 2-dp cast can land on a .xx5 halfway point where Spark (HALF_UP) and
# DuckDB disagree by a penny; 10 fractional digits keeps the cast far from
# any halfway case while still making the SUM order-independent.
def _rev_s() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )


_REV_D = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between distinct nation pairs by
    ship-year (supplier nation ≠ customer nation)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(_rev_s()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM({_REV_D}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    enriched with the customer — aggregate-then-join so only qualifying
    keys hit the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       big.total_qty
FROM big
JOIN orders o   ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted — fixtures have no c_phone): customers with
    above-average positive balance and no RECENT orders (≥ 2000-01-01),
    rolled up per market segment.  Scalar AVG broadcast via crossJoin;
    left-anti join for "no recent orders" with the recency predicate pushed
    below the join so only the filtered slice of orders is shuffled."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        safe_divide(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"),
            F.count("*").cast("double"),
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


Q22_ORACLE = """
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c, thr
WHERE c.c_acctbal > thr.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= DATE '2000-01-01')
GROUP BY 1
"""


register(QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_ORACLE,
                   headline=True, tags=("J1", "J4", "A1", "A2")))
register(QuerySpec("q18_large_orders", q18_large_orders, Q18_ORACLE,
                   tags=("A1", "A2", "J1")))
register(QuerySpec("q22_idle_rich_customers", q22_idle_rich_customers,
                   Q22_ORACLE, tags=("A5", "J7")))
