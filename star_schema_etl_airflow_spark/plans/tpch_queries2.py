"""Second TPC-H wave: the remaining query shapes expressible over the
fixture star schema (no ``partsupp`` table exists, so Q2/Q9/Q11/Q16/Q20
are out of reach; Q4/Q21 substitute a shipdate-vs-orderdate lateness
predicate for the missing commit/receipt dates).

Shapes covered and why they matter:
- Q6  — pure scan-side filter + agg: the predicate-pushdown benchmark.
- Q4  — EXISTS correlated on a non-equi condition (lateness) → semi join.
- Q8  — market share: 7-table join tree + conditional decimal share.
- Q14 — conditional-aggregate ratio (promo revenue).
- Q15 — agg view + scalar-subquery MAX equality (top supplier, tie-safe).
- Q17 — per-group correlated average threshold (small-quantity parts).
- Q19 — OR-of-ANDs disjunctive join predicate (pushdown stress).
- Q21 — multi-correlation (EXISTS + NOT EXISTS) recast as one grouped
  pass over (order, supplier) lateness flags.

Scale design notes:
- Q6 reads two doubles + a date with every predicate pushed to parquet
  (min/max row-group pruning on ``l_shipdate``); nothing shuffles but a
  single scalar partial-agg tree.
- Q4's semi join keys the fact on ``l_orderkey`` only; the lateness
  predicate rides along as a join residual, so no pre-join explosion.
- Q8/Q19 broadcast every dim side (part ≤ millions of rows ≪ fact);
  the fact shuffles once, on its aggregation key.
- Q15 computes the max over the already-aggregated per-supplier view
  (supplier-cardinality rows, not fact rows) and broadcasts the 1-row
  max back — no second fact scan, no ``.collect()``.
- Q17's per-part average is computed on the Brand-filtered slice only
  (broadcast both directions); the 0.2× threshold compare happens in
  double on both engines (identical literals → identical doubles).
- Q21 replaces TPC-H's double correlated subquery with ONE groupBy over
  (orderkey, suppkey) lateness flags + an order-partitioned window —
  three shuffles total on a 100 TB fact (plan-pinned), versus the naive
  3 correlated fact scans; the "exactly one late supplier in a
  multi-supplier order" condition becomes plain column arithmetic.

Reference parity: the reference caps out at GROUP BY + MERGE
(sql/datamart/sales/sales_summary.sql:38-60); this module is the
beyond-reference analytic surface the engine adds, tagged accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

# Decimal-exact revenue recipe (see tpch_queries._rev_s): multiply raw
# 2/4-dp columns in DECIMAL, sum exactly, narrow to scale 6 before the
# double cast so the unscaled sum stays < 2^53 on both engines.
def _rev_s() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(2,0)") - F.col("l_discount").cast("decimal(6,4)")
    )


_REV_D = ("CAST(l_extendedprice AS DECIMAL(18,2))"
          " * (1 - CAST(l_discount AS DECIMAL(6,4)))")


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase from hypothetically eliminating
    discounts — a single filtered scan, no joins, every predicate
    pushed down to the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(6,4)")
            )
            .cast("decimal(32,6)")
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q6_ORACLE = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(32,6))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: no commit/receipt dates in the fixture —
    "late" means a line shipped > 90 days after the order date): count
    orders per priority, placed in one quarter, having at least one late
    line.  EXISTS → left-semi join with the lateness residual."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY 1
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1's share of PROMO-part revenue sold to
    AMERICA-region customers, per order year — the widest join tree in
    the suite (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ part ⋈ nation×2
    ⋈ region), every dim broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    ).select("r_regionkey")
    cust_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_s()
    zero = F.lit(0).cast("decimal(25,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(zero))
            .cast("decimal(32,6)").cast("double").alias("nation_rev"),
            F.sum(rev).cast("decimal(32,6)").cast("double").alias("total_rev"),
        )
        .select(
            "o_year",
            (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
            "total_rev",
        )
    )


Q8_ORACLE = f"""
WITH per_year AS (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
         CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN {_REV_D}
                            ELSE CAST(0 AS DECIMAL(25,6)) END) AS DECIMAL(32,6))
              AS DOUBLE) AS nation_rev,
         CAST(CAST(SUM({_REV_D}) AS DECIMAL(32,6)) AS DOUBLE) AS total_rev
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE p.p_type = 'PROMO' AND r.r_name = 'AMERICA'
  GROUP BY 1
)
SELECT o_year, nation_rev / total_rev AS mkt_share, total_rev
FROM per_year
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: the share of one month's revenue from PROMO parts —
    conditional aggregation over a broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_s()
    zero = F.lit(0).cast("decimal(25,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .cast("decimal(32,6)").cast("double").alias("promo_rev"),
            F.sum(rev).cast("decimal(32,6)").cast("double").alias("total_rev"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"))
            .alias("promo_pct"),
            "promo_rev",
            "total_rev",
        )
    )


Q14_ORACLE = f"""
WITH agg AS (
  SELECT CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_D}
                            ELSE CAST(0 AS DECIMAL(25,6)) END) AS DECIMAL(32,6))
              AS DOUBLE) AS promo_rev,
         CAST(CAST(SUM({_REV_D}) AS DECIMAL(32,6)) AS DOUBLE) AS total_rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= DATE '1997-09-01' AND l.l_shipdate < DATE '1997-10-01'
)
SELECT 100.0 * promo_rev / total_rev AS promo_pct, promo_rev, total_rev
FROM agg
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue over one quarter.
    The MAX equality runs on the exact DECIMAL sums (tie-safe — double
    rounding can't fake or break a tie); the 1-row max is broadcast via
    crossJoin, never collected."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev_s()).cast("decimal(32,6)").alias("total_rev_dec"))
    )
    max_rev = rev.agg(F.max("total_rev_dec").alias("max_rev_dec"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev_dec") == F.col("max_rev_dec"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_rev"),
        )
    )


Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_REV_D}) AS DECIMAL(32,6)) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev_dec AS DOUBLE) AS total_rev
FROM rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (p_container → p_size < 10): average yearly
    revenue lost if Brand#4 small-part orders below 20% of that part's
    average quantity were not filled.  The correlated per-part AVG
    becomes a groupBy on the brand-filtered slice joined back."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = branded.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        branded.join(F.broadcast(avg_qty), branded.l_partkey == F.col("avg_pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double") / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


Q17_ORACLE = """
WITH branded AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#4' AND p.p_size < 10
), avg_qty AS (
  SELECT l_partkey AS avg_pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM branded GROUP BY 1
)
SELECT CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM branded b
JOIN avg_qty a ON b.l_partkey = a.avg_pk
WHERE b.l_quantity < 0.2 * a.avg_qty
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (p_container → p_size bands): revenue from three
    OR-ed (brand, size-band, quantity-band) clauses — the disjunctive
    join-predicate pushdown stress test.  The shared ``l_partkey``
    equi-key carries the join; the OR rides as a residual filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    clause = (
        ((F.col("p_brand") == "Brand#4") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(10, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#19") & sz.between(20, 40) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(
            F.sum(_rev_s()).cast("decimal(32,6)").cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q19_ORACLE = f"""
SELECT CAST(CAST(SUM({_REV_D}) AS DECIMAL(32,6)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1  AND 15 AND l.l_quantity BETWEEN 1  AND 11)
   OR (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 10 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 40 AND l.l_quantity BETWEEN 20 AND 30)
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" = shipped > 60 days after the
    order date): suppliers who were the SOLE late supplier on a
    multi-supplier finalized order.  TPC-H states this as EXISTS +
    NOT EXISTS over two more lineitem scans; here it is one groupBy to
    (order, supplier) lateness flags, an order-grain rollup, and a
    filter — column arithmetic instead of double correlation."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
                .cast("int")
            ).alias("late")
        )
    )
    # Order-grain rollup as a window over the (already supplier-grain)
    # flags — one exchange on l_orderkey, instead of the separate
    # groupBy + join-back (two extra exchanges for the same answer).
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_orderkey")
    sole_late = (
        per_os.select(
            "l_orderkey",
            "l_suppkey",
            "late",
            F.count("*").over(w).alias("n_supps"),
            F.sum("late").over(w).alias("n_late"),
        )
        .filter((F.col("late") == 1) & (F.col("n_supps") >= 2) & (F.col("n_late") == 1))
    )
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


Q21_ORACLE = """
WITH per_os AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2
), per_order AS (
  SELECT l_orderkey AS ok, COUNT(*) AS n_supps, SUM(late) AS n_late
  FROM per_os GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM per_os p
JOIN per_order o ON p.l_orderkey = o.ok
JOIN supplier s  ON p.l_suppkey = s.s_suppkey
WHERE p.late = 1 AND o.n_supps >= 2 AND o.n_late = 1
GROUP BY 1, 2
"""


register(QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE,
                   tags=("P2", "A2")))
register(QuerySpec("q4_order_priority", q4_order_priority, Q4_ORACLE,
                   tags=("J7", "A1")))
register(QuerySpec("q8_market_share", q8_market_share, Q8_ORACLE,
                   tags=("J1", "J4", "A6")))
register(QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_ORACLE,
                   tags=("J4", "A6", "P6")))
register(QuerySpec("q15_top_supplier", q15_top_supplier, Q15_ORACLE,
                   tags=("A5", "A4")))
register(QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue,
                   Q17_ORACLE, tags=("A5", "A6", "J4")))
register(QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue,
                   Q19_ORACLE, tags=("J4", "P6")))
register(QuerySpec("q21_waiting_suppliers", q21_waiting_suppliers, Q21_ORACLE,
                   tags=("A1", "J7")))
