"""Third TPC-H wave: the partsupp-family shapes (Q2/Q9/Q11/Q16/Q20)
adapted to the fixture star schema.

The fixtures carry no ``partsupp`` table, so the part↔supplier
association (and its cost/availability attributes) is reconstructed from
``lineitem`` — the association that actually matters at 100 TB, since it
is the fact-derived one:

- Q2  — min-cost supplier per part: correlated per-part MIN + equality
  join back (the classic argmin shape).  "Cost" is the observed unit
  price ``l_extendedprice / l_quantity`` (row-wise double division is
  IEEE-deterministic on both engines, so MIN-equality is exact).
- Q9  — product-type profit by nation and year: 5-way join tree with a
  decimal-exact profit expression (revenue minus a 0.6×retail-price
  cost proxy for the missing ``ps_supplycost``).
- Q16 — supplier-relationship census: COUNT(DISTINCT supplier) per
  (brand, type, size) with a NOT IN exclusion subquery → broadcast
  anti join.
- Q20 — promotion-candidate suppliers: two nested IN subqueries
  (qualifying shipments HAVING a quantity floor; nations of one
  region) → semi-join chain, no correlated re-scan.
- Q11 — important stock: per-part value for a restricted supplier set,
  HAVING value above a fraction of the global total (broadcast 1-row
  scalar subquery; threshold data-adaptive so it binds at every sf).

Q12 is NOT expressible (no ``l_shipmode``/commit/receipt dates in the
fixture); its CASE-conditional-aggregation shape is already covered by
``q14_promo_revenue`` and ``q8_market_share``.  Q13's shape ships as
``sq13_orders_per_customer`` (plans/subquery_queries.py).  With those,
all 22 TPC-H query shapes are represented.

Scale design notes:
- Q2 aggregates lineitem once on (partkey, suppkey) — the same shuffle
  key serves both the per-pair MIN and (after a map-side re-agg) the
  per-part argmin; part/supplier/nation/region dims broadcast.
- Q9 filters part on the name token BEFORE the fact join (broadcast),
  so the fact scan is pruned by the runtime filter on ``l_partkey``.
- Q16's exclusion list (delinquent suppliers) is tiny → broadcast
  LeftAnti; the distinct-count shuffles on the grouping key only.
- Q20's qualifying-pairs aggregate reuses the (partkey, suppkey)
  shuffle and feeds a broadcast semi join against supplier — the fact
  is scanned exactly once.

Reference parity: beyond-reference analytic surface (the reference
caps out at GROUP BY + MERGE, sql/datamart/sales/sales_summary.sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every size-15 part, the supplier(s) offering
    the minimum observed unit price, restricted to EUROPE suppliers."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    # one shuffle on (partkey, suppkey); the per-part argmin reuses it
    pair_min = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("unit_price").alias("min_up")
    )
    best = (
        pair_min.groupBy("l_partkey")
        .agg(F.min("min_up").alias("best_up"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_brand")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        pair_min.join(
            best,
            (pair_min.l_partkey == best.b_partkey)
            & (pair_min.min_up == best.best_up),
        )
        .select("l_partkey", "l_suppkey", "best_up")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(euro_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal", "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey", "p_brand",
            F.col("best_up").alias("min_unit_price"),
        )
    )


Q2_ORACLE = """
WITH pair_min AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS min_up
  FROM lineitem GROUP BY 1, 2
), best AS (
  SELECT l_partkey, MIN(min_up) AS best_up FROM pair_min GROUP BY 1
)
SELECT s.s_acctbal, s.s_name, n.n_name AS nation,
       p.p_partkey, p.p_brand, b.best_up AS min_unit_price
FROM pair_min u
JOIN best b ON u.l_partkey = b.l_partkey AND u.min_up = b.best_up
JOIN part p ON p.p_partkey = u.l_partkey AND p.p_size = 15
JOIN supplier s ON s.s_suppkey = u.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'bolt' parts by supplier nation and
    order year.  Cost proxy: 0.6 × p_retailprice per unit (the fixture
    has no ps_supplycost); all money math decimal-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("bolt"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(2,0)") - F.col("l_discount").cast("decimal(6,4)")
    )
    cost = (
        F.col("p_retailprice").cast("decimal(8,2)")
        * F.lit(0.6).cast("decimal(2,1)")
        * F.col("l_quantity").cast("decimal(3,0)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum((revenue - cost).cast("decimal(25,6)"))
            .cast("decimal(32,6)")
            .cast("double")
            .alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q9_ORACLE = """
SELECT n.n_name AS nation,
       EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       CAST(CAST(SUM(CAST(
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(6,4)))
             - CAST(p.p_retailprice AS DECIMAL(8,2))
               * CAST(0.6 AS DECIMAL(2,1))
               * CAST(l.l_quantity AS DECIMAL(3,0))
           AS DECIMAL(25,6))) AS DECIMAL(32,6)) AS DOUBLE) AS sum_profit,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


Q16_SIZES = (3, 9, 14, 19, 23, 36, 45, 49)


def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) for a
    size slice, excluding one brand, a type prefix, and delinquent
    suppliers (acctbal < 0 — the 'complaints' stand-in) via NOT IN →
    broadcast anti join."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(*Q16_SIZES))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    delinquent = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(delinquent),
            F.col("l_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#12'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN {Q16_SIZES}
  AND NOT EXISTS (
    SELECT 1 FROM supplier s
    WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey)
GROUP BY 1, 2, 3
"""


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: EUROPE suppliers who shipped > 50 units of any
    'bolt' part during 1997 — nested IN subqueries decorrelated into a
    grouped HAVING + two broadcast semi joins."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    bolt_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("bolt"))
        .select("p_partkey")
    )
    qualifying = (
        li.join(F.broadcast(bolt_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("ship_qty"))
        .filter(F.col("ship_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(euro), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > 50)
  AND s_nationkey IN (
    SELECT n_nationkey FROM nation
    JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE')
"""


register(QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_ORACLE,
                   tags=("A4", "A5", "J4")))
register(QuerySpec("q9_product_type_profit", q9_product_type_profit, Q9_ORACLE,
                   tags=("J1", "J4", "A1", "A2")))
register(QuerySpec("q16_supplier_relationship", q16_supplier_relationship,
                   Q16_ORACLE, tags=("A3", "J7")))
register(QuerySpec("q20_promotion_suppliers", q20_promotion_suppliers,
                   Q20_ORACLE, tags=("J7", "A1")))


# --- Q11: important stock identification ------------------------------------

# TPC-H Q11 thresholds with 0.0001/SF — an external knob.  Here the
# threshold is data-adaptive (1.2× the mean per-part share) so the HAVING
# binds non-trivially at every fixture scale; the *shape* — group-sum vs
# a global scalar-subquery fraction — is exactly Q11's.
Q11_NATIONKEY_BOUND = 8
Q11_FACTOR = 1.2


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part held value for a restricted supplier set,
    HAVING value > (fraction of the global total) — the global total and
    part count arrive via a broadcast 1-row scalar subquery.

    Fixture adaptation (no ``partsupp``, cf. module docstring): held value
    is the decimal-exact SUM of ``l_extendedprice`` over the suppliers
    with ``s_nationkey < 8`` (a nation *set* rather than one name — the
    per-scale fixtures populate nations unevenly, single names can be
    empty at some sf).  The threshold compare happens in double on both
    engines (identical inputs → identical IEEE results).

    Scale design: the fact shuffles once, on ``l_partkey``; the supplier
    filter is a broadcast semi join; the total is a second aggregate over
    the already part-grained relation (part-cardinality rows, not fact
    rows) broadcast back as one row.  No fact re-scan, no collect."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < Q11_NATIONKEY_BOUND)
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"),
                "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("stock_value")
        )
    )
    totals = per_part.agg(
        F.sum("stock_value").alias("__total"),
        F.count(F.lit(1)).alias("__nparts"),
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .filter(
            F.col("stock_value").cast("double")
            > F.col("__total").cast("double") / F.col("__nparts")
            * F.lit(Q11_FACTOR)
        )
        # decimal internal (exact sum + threshold), double at the edge
        .select("l_partkey", F.col("stock_value").cast("double")
                .alias("stock_value"))
    )


Q11_ORACLE = f"""
WITH v AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS stock_value
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier WHERE s_nationkey < {Q11_NATIONKEY_BOUND})
  GROUP BY l_partkey
),
t AS (SELECT SUM(stock_value) AS total, COUNT(*) AS np FROM v)
SELECT l_partkey, CAST(stock_value AS DOUBLE) AS stock_value
FROM v, t
WHERE CAST(stock_value AS DOUBLE) > CAST(total AS DOUBLE) / np * {Q11_FACTOR}
"""

register(QuerySpec("q11_important_stock", q11_important_stock, Q11_ORACLE,
                   tags=("A1", "A5", "J7")))
