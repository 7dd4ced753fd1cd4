"""Correlated-subquery analytics (TPC-H Q17/Q13 shapes) — the decorrelation
patterns a warehouse engine must handle beyond plain GROUP BY.

The reference's SQL ceiling is scalar subqueries (max-sk seed); these cover
the two classic correlated shapes, expressed the way Catalyst executes them
after decorrelation — an explicit aggregate-then-join — so the plan is the
optimized form by construction:

- per-group scalar compare (Q17: "quantity below 20% of the part's
  average"): group-aggregate the correlation key, equi-join back, filter.
  At 100 TB both sides shuffle once on ``l_partkey`` (or AQE broadcasts
  the aggregate — it is |parts| rows, far smaller than lineitem).
- COUNT-over-outer-join histogram (Q13): left join preserves zero-order
  customers, ``COUNT(col)`` counts only matches, second tiny aggregate.

Float-parity note: the Q17 threshold ``qty < 0.2 * AVG(qty)`` is evaluated
as ``5 * qty * cnt < sum`` over DECIMAL — float AVG is
accumulation-order-dependent, so the differential check would be flaky on
the boundary; the decimal cross-multiplication is exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.scalars import sum_money
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

# --- SQ17: per-group scalar-subquery compare (TPC-H Q17 shape) -------------


def sq17_below_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(per_part, "l_partkey")
        # qty < 0.2 * (qty_sum / cnt)  ⇔  5 * qty * cnt < qty_sum (exact)
        .filter(
            F.expr("5 * cast(l_quantity as decimal(18,2)) * cnt < qty_sum")
        )
        .agg(
            sum_money(F.col("l_extendedprice")).alias("below_avg_revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQ17_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS below_avg_revenue,
       COUNT(*) AS n_rows
FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
WHERE 5 * CAST(l.l_quantity AS DECIMAL(18,2)) * p.cnt < p.qty_sum
"""

# --- SQ13: outer-join COUNT histogram (TPC-H Q13 shape) --------------------


def sq13_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


SQ13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
"""

register(QuerySpec("sq17_below_avg_qty", sq17_below_avg_qty, SQ17_ORACLE,
                   tags=("SQ17",)))
register(QuerySpec("sq13_orders_per_customer", sq13_orders_per_customer,
                   SQ13_ORACLE, tags=("SQ13",)))


# --- LATERAL correlated subquery --------------------------------------------


def lat1_top2_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: the two most expensive line items
    per order (ties → lowest part key).  Catalyst decorrelates the
    per-row LIMIT into a ranked join — no per-order re-scan of lineitem
    — which is exactly why LATERAL is safe at fact scale; the
    deterministic ORDER BY makes it oracle-checkable."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_o")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__lat_l")
    return spark.sql("""
      SELECT o.o_orderkey, o.o_orderpriority,
             t.l_partkey, t.l_extendedprice
      FROM __lat_o o,
      LATERAL (
        SELECT l_partkey, l_extendedprice
        FROM __lat_l l
        WHERE l.l_orderkey = o.o_orderkey
        ORDER BY l_extendedprice DESC, l_partkey
        LIMIT 2
      ) t
      WHERE o.o_orderkey < 1000
    """)


LAT1_ORACLE = """
SELECT o.o_orderkey, o.o_orderpriority,
       t.l_partkey, t.l_extendedprice
FROM orders o,
LATERAL (
  SELECT l_partkey, l_extendedprice
  FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_partkey
  LIMIT 2
) t
WHERE o.o_orderkey < 1000
"""

register(QuerySpec("lat1_top2_per_order", lat1_top2_per_order, LAT1_ORACLE,
                   tags=("LATERAL", "TN1")))
