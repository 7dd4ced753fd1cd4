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
from star_schema_etl_airflow_spark.sources.fixtures import (
    load_table,
    spread_scan,
)

# Decimal-exact per-row revenue: cast the raw 2-dp columns to decimal and
# multiply in decimal (exact, order-independent, identical across engines).
# Casting the double PRODUCT to decimal instead is a trap twice over: a
# 2-dp cast lands on .xx5 halfway points (HALF_UP vs round-half-even), and
# a 10-dp cast makes the summed unscaled int128 exceed 2^53, where
# DuckDB's int->double->divide conversion double-rounds off Spark's
# BigDecimal path.  True scale here is 4 (2-dp price x 2-dp discount).
def _rev_s() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(2,0)") - F.col("l_discount").cast("decimal(6,4)")
    )


_REV_D = ("CAST(l_extendedprice AS DECIMAL(18,2))"
          " * (1 - CAST(l_discount AS DECIMAL(6,4)))")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between distinct nation pairs by
    ship-year (supplier nation ≠ customer nation)."""
    # r16: the single-row-group fixture scan caps this whole broadcast-
    # probe + partial-agg pipeline at its split count (measured: one
    # 3-task stage carrying 1.3 s of task time at sf0.1); spread_scan
    # hash-spreads the 5-column projection across the cores and is a
    # no-op at production split counts.  1.56 s → 0.94 s min-of-3.
    li = spread_scan(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey",
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
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
            F.sum(_rev_s()).cast("decimal(32,6)").cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       CAST(CAST(SUM({_REV_D}) AS DECIMAL(32,6)) AS DOUBLE) AS revenue,
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


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical pricing summary — one wide partial-agg
    scan, grouped on the 2-value flag/status pair.  All money aggregates
    are decimal-exact (order-independent); averages divide exact sums by
    counts so both engines agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    # Multiply in DECIMAL, not double: the raw columns are exact 2-4-dp
    # values (safe to cast), and decimal x decimal is exact in both
    # engines -- whereas casting a double product to decimal rounds a
    # scaled value near 2^53, where Spark and DuckDB disagree in the last
    # ulp (~1e-10/row, visible after a 60k-row sum).
    dec_d = F.col("l_discount").cast("decimal(6,4)")
    dec_t = F.col("l_tax").cast("decimal(6,4)")
    disc = dec("l_extendedprice") * (F.lit(1).cast("decimal(2,0)") - dec_d)
    charge = disc * (F.lit(1).cast("decimal(2,0)") + dec_t)
    cnt = F.count("*")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            # scale-6 first: the charge's true scale is 6 (trailing
            # zeros beyond), and at scale 10 the sum's unscaled int128
            # exceeds 2^53, where DuckDB's int->double->divide cast
            # double-rounds 1 ulp off Spark's BigDecimal conversion
            F.sum(charge).cast("decimal(32,6)").cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(6,4)))
                * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(32,6)) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

register(QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE,
                   tags=("A1", "A2", "P2")))


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one market
    segment.  Deterministic top-N: revenue is decimal-exact and ties
    break on (o_orderdate, o_orderkey)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_s()).cast("decimal(32,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "o_orderkey")
        .limit(10)
    )


Q3_ORACLE = f"""
SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(CAST(SUM({_REV_D}) AS DECIMAL(32,6)) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-01-01'
  AND l.l_shipdate  > DATE '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o.o_orderdate, o.o_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where supplier and customer share a nation,
    rolled up per nation within one region — the 6-way join tree with
    the region/nation dims broadcast."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem")
    n_in_region = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n_in_region), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_rev_s()).cast("decimal(32,6)").cast("double").alias("revenue"))
    )


Q5_ORACLE = f"""
SELECT n.n_name,
       CAST(CAST(SUM({_REV_D}) AS DECIMAL(32,6)) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
GROUP BY 1
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer over
    one quarter — agg on the customer key, broadcast-enrich after."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1998-04-01")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_rev_s()).cast("decimal(32,6)").cast("double").alias("revenue"))
    )
    profile = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
    return per_cust.join(
        F.broadcast(profile), per_cust.o_custkey == profile.c_custkey
    ).select("c_custkey", "c_name", "c_acctbal", "nation", "revenue")


Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation,
       CAST(CAST(SUM({_REV_D}) AS DECIMAL(32,6)) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '1998-01-01' AND o.o_orderdate < DATE '1998-04-01'
GROUP BY 1, 2, 3, 4
"""

register(QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE,
                   tags=("A1", "J1", "TN1")))
register(QuerySpec("q5_local_supplier_volume", q5_local_supplier_volume,
                   Q5_ORACLE, tags=("A1", "J1", "J4")))
register(QuerySpec("q10_returned_items", q10_returned_items, Q10_ORACLE,
                   tags=("A1", "J1", "J4")))
