"""General analytics operator families beyond the reference's own inventory:
window functions (LAG/LEAD, running and rolling frames, NTILE), ROLLUP/CUBE
with GROUPING_ID, set operations (INTERSECT/EXCEPT/UNION ALL), semi/anti
joins, PIVOT, and top-N per group.

The reference's datamart layer stops at plain GROUP BY (SURVEY.md §2.5); a
user replacing it with this engine gets the full analytic-SQL surface.  Every
query here is oracle-checked against DuckDB (hash-exact), and every
expression is built-in/JVM-side — no Python UDFs.

Scale notes (100 TB):
- Window queries partition by a key (customer) — parallel windows, never the
  single-partition global-window antipattern.
- ROLLUP/CUBE expand via Catalyst's ``Expand`` operator: one shuffle on the
  grouping-set id + keys, partial aggregation map-side.
- Set ops and semi/anti joins are key-only shuffles (projection pruned to the
  join key before the exchange); at scale these are the cheap way to express
  cohort membership — never a ``collect`` + ``isin``.
- Top-N per group: partial ``row_number`` after a shuffle on the group key;
  with AQE skew splitting, hot groups split without manual salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.scalars import sum_money
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

# --- W2: LAG / LEAD over per-customer order sequences ---------------------


def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # (order_date, o_orderkey) is unique per customer → deterministic frame
    w = Window.partitionBy("o_custkey").orderBy("order_date", "o_orderkey")
    return (
        o.withColumn("order_date", F.to_date("o_orderdate"))
        .select(
            "o_custkey",
            "o_orderkey",
            "order_date",
            F.lag("order_date").over(w).alias("prev_order_date"),
            F.datediff(F.col("order_date"), F.lag("order_date").over(w))
            .cast("int")
            .alias("days_since_prev"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
        )
    )


W2_ORACLE = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       LAG(CAST(o_orderdate AS DATE)) OVER w AS prev_order_date,
       CAST(date_diff('day',
            LAG(CAST(o_orderdate AS DATE)) OVER w,
            CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
       LEAD(o_orderkey) OVER w AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
"""

# --- W3: running total + rolling 3-row frame per customer -----------------


def w3_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("order_date", "o_orderkey")
    money = F.col("o_totalprice").cast("decimal(18,2)")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rolling3 = w.rowsBetween(-2, Window.currentRow)
    return (
        o.withColumn("order_date", F.to_date("o_orderdate"))
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("int").alias("order_seq"),
            F.sum(money).over(running).cast("double").alias("cum_spend"),
            F.sum(money).over(rolling3).cast("double").alias("rolling3_spend"),
            F.count("*").over(rolling3).cast("int").alias("rolling3_n"),
        )
    )


W3_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS cum_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS rolling3_spend,
       CAST(COUNT(*)
            OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS INTEGER) AS rolling3_n
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
"""

# --- W5: NTILE / RANK / PERCENT_RANK customer spend quartiles -------------


def w5_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__spend_dec"))
    )
    # exact-decimal spend → the (spend desc, custkey) order is deterministic
    w = Window.orderBy(F.col("__spend_dec").desc(), F.col("o_custkey"))
    return spend.select(
        "o_custkey",
        F.col("__spend_dec").cast("double").alias("total_spend"),
        F.ntile(4).over(w).cast("int").alias("spend_quartile"),
        F.rank().over(w).cast("int").alias("spend_rank"),
        F.round(F.percent_rank().over(w), 9).alias("spend_pct_rank"),
    )


W5_ORACLE = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(spend_dec AS DOUBLE) AS total_spend,
       CAST(NTILE(4) OVER w AS INTEGER) AS spend_quartile,
       CAST(RANK() OVER w AS INTEGER) AS spend_rank,
       ROUND(PERCENT_RANK() OVER w, 9) AS spend_pct_rank
FROM spend
WINDOW w AS (ORDER BY spend_dec DESC, o_custkey)
"""

# --- A7: ROLLUP with GROUPING_ID (nation × order-year revenue) ------------


def a7_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    enriched = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            "o_totalprice",
        )
    )
    return (
        enriched.rollup("nation", "order_year")
        .agg(
            sum_money(F.col("o_totalprice")).alias("revenue"),
            F.count("*").alias("n_orders"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


A7_ORACLE = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS order_year,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders,
       CAST(GROUPING(n.n_name) * 2 + GROUPING(EXTRACT(YEAR FROM o.o_orderdate))
            AS INTEGER) AS gid
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, EXTRACT(YEAR FROM o.o_orderdate))
"""

# --- A8: CUBE over pricing flags ------------------------------------------


def a8_cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            sum_money(F.col("l_extendedprice")).alias("sum_price"),
            F.count("*").alias("n_rows"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


A8_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

# --- SET1: INTERSECT / EXCEPT / UNION ALL cohort membership ---------------

SET_Y1, SET_Y2 = 1996, 1997


def _year_custs(o: DataFrame, year: int) -> DataFrame:
    return (
        o.filter(F.year("o_orderdate") == year)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )


def set1_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y1, y2 = _year_custs(o, SET_Y1), _year_custs(o, SET_Y2)
    both = y1.intersect(y2).withColumn("cohort", F.lit("both"))
    only1 = y1.exceptAll(y2).withColumn("cohort", F.lit(f"only_{SET_Y1}"))
    only2 = y2.exceptAll(y1).withColumn("cohort", F.lit(f"only_{SET_Y2}"))
    return both.unionByName(only1).unionByName(only2)


SET1_ORACLE = f"""
WITH y1 AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
            WHERE EXTRACT(YEAR FROM o_orderdate) = {SET_Y1}),
     y2 AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
            WHERE EXTRACT(YEAR FROM o_orderdate) = {SET_Y2})
SELECT c_custkey, 'both' AS cohort FROM (SELECT * FROM y1 INTERSECT SELECT * FROM y2)
UNION ALL
SELECT c_custkey, 'only_{SET_Y1}' AS cohort FROM (SELECT * FROM y1 EXCEPT SELECT * FROM y2)
UNION ALL
SELECT c_custkey, 'only_{SET_Y2}' AS cohort FROM (SELECT * FROM y2 EXCEPT SELECT * FROM y1)
"""

# --- J7: semi / anti joins (EXISTS / NOT EXISTS) --------------------------


def j7_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    okeys = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    active = c.join(okeys, on="c_custkey", how="left_semi").withColumn(
        "status", F.lit("active")
    )
    inactive = c.join(okeys, on="c_custkey", how="left_anti").withColumn(
        "status", F.lit("inactive")
    )
    return active.unionByName(inactive)


J7_ORACLE = """
SELECT c_custkey, c_mktsegment, 'active' AS status FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, c_mktsegment, 'inactive' AS status FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

# --- PV1: PIVOT (order-priority revenue per nation) -----------------------

_PRIORITIES = [
    ("1-URGENT", "rev_urgent"),
    ("2-HIGH", "rev_high"),
    ("3-MEDIUM", "rev_medium"),
    ("4-NOT SPECIFIED", "rev_not_specified"),
    ("5-LOW", "rev_low"),
]


def pv1_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    enriched = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "o_orderpriority", "o_totalprice")
    )
    pivoted = (
        enriched.groupBy("nation")
        .pivot("o_orderpriority", [p for p, _ in _PRIORITIES])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
    )
    return pivoted.select(
        "nation",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("double").alias(alias)
            for p, alias in _PRIORITIES
        ],
    )


_PV1_CASES = ",\n".join(
    f"""       CAST(COALESCE(SUM(CASE WHEN o.o_orderpriority = '{p}'
            THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS {alias}"""
    for p, alias in _PRIORITIES
)

PV1_ORACLE = f"""
SELECT n.n_name AS nation,
{_PV1_CASES}
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

# --- TN1: top-N per group (top 3 parts by revenue per supplier nation) ----

TOPN = 3


def tn1_top_parts_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
                li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("__rev_dec")
        )
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("__rev_dec").desc(), F.col("l_partkey")
    )
    return (
        rev.withColumn("part_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("part_rank") <= TOPN)
        .select(
            "nation",
            "l_partkey",
            F.col("__rev_dec").cast("double").alias("part_revenue"),
            "part_rank",
        )
    )


TN1_ORACLE = f"""
WITH rev AS (
  SELECT n.n_name AS nation, l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev_dec
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, l.l_partkey
), ranked AS (
  SELECT nation, l_partkey, rev_dec,
         CAST(ROW_NUMBER() OVER (PARTITION BY nation
              ORDER BY rev_dec DESC, l_partkey) AS INTEGER) AS part_rank
  FROM rev
)
SELECT nation, l_partkey, CAST(rev_dec AS DOUBLE) AS part_revenue, part_rank
FROM ranked WHERE part_rank <= {TOPN}
"""

# --- registration ---------------------------------------------------------

register(QuerySpec("w2_lag_lead", w2_lag_lead, W2_ORACLE, tags=("W2",)))
register(QuerySpec("w3_running_frames", w3_running_frames, W3_ORACLE, tags=("W3",)))
register(QuerySpec("w5_spend_quartiles", w5_spend_quartiles, W5_ORACLE, tags=("W5",)))
register(QuerySpec("a7_rollup_revenue", a7_rollup_revenue, A7_ORACLE, tags=("A7",)))
register(QuerySpec("a8_cube_pricing", a8_cube_pricing, A8_ORACLE, tags=("A8",)))
register(QuerySpec("set1_customer_cohorts", set1_customer_cohorts, SET1_ORACLE,
                   tags=("SET1",)))
register(QuerySpec("j7_semi_anti", j7_semi_anti, J7_ORACLE, tags=("J7",)))
register(QuerySpec("pv1_priority_pivot", pv1_priority_pivot, PV1_ORACLE,
                   tags=("PV1",)))
register(QuerySpec("tn1_top_parts_per_nation", tn1_top_parts_per_nation,
                   TN1_ORACLE, tags=("TN1",)))


def gs1_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    (lang, source), (lang), (source) over documents — via the SQL surface
    (``sources/sql_exec.py``), since the DataFrame API exposes only the
    rollup/cube specializations.  Same Expand-based plan as A7/A8."""
    from star_schema_etl_airflow_spark.sources.sql_exec import run_sql

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_v"
    )
    return run_sql(spark, """
        SELECT lang, source, COUNT(*) AS n_docs,
               SUM(n_chars) AS total_chars,
               CAST(GROUPING(lang) AS INT) AS g_lang,
               CAST(GROUPING(source) AS INT) AS g_source
        FROM documents_v
        GROUP BY GROUPING SETS ((lang, source), (lang), (source))
    """)


GS1_ORACLE = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(GROUPING(lang) AS INTEGER) AS g_lang,
       CAST(GROUPING(source) AS INTEGER) AS g_source
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), (source))
"""

register(QuerySpec("gs1_grouping_sets", gs1_grouping_sets, GS1_ORACLE,
                   tags=("A7", "S3")))


def w6_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value-function census: FIRST_VALUE / LAST_VALUE / NTH_VALUE
    over a full-partition frame plus CUME_DIST, per customer order history.
    Deterministic: the window orders on the unique (o_orderdate, o_orderkey)
    pair, and the money column is compared raw (no arithmetic)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
        F.cume_dist().over(w).alias("cd"),
    )


W6_ORACLE = """
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER wf AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER wf AS second_price,
       CUME_DIST() OVER w AS cd
FROM orders
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

register(QuerySpec("w6_value_windows", w6_value_windows, W6_ORACLE,
                   tags=("W2", "window-census")))


def a10_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolating percentile) and deterministic mode per
    market segment.  Spark's ``mode()`` breaks frequency ties arbitrarily,
    so the mode here is computed explicitly: max count, then smallest
    value — deterministic in any engine.  Median interpolation is the
    same two-double average in both engines (exact on raw values)."""
    cust = load_table(spark, sf_dir, "customer")
    med = cust.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("median_bal"),
        F.count("*").alias("n_custs"),
    )
    counts = (
        cust.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c").desc(), F.col("c_nationkey")
    )
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", F.col("c_nationkey").alias("mode_nation"),
                F.col("c").alias("mode_count"))
    )
    return med.join(modes, "c_mktsegment")


A10_ORACLE = """
WITH med AS (
  SELECT c_mktsegment, quantile_cont(c_acctbal, 0.5) AS median_bal,
         COUNT(*) AS n_custs
  FROM customer GROUP BY 1
),
counts AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS c
  FROM customer GROUP BY 1, 2
),
modes AS (
  SELECT c_mktsegment, c_nationkey AS mode_nation, c AS mode_count
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY c_mktsegment ORDER BY c DESC, c_nationkey) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT m.c_mktsegment, m.median_bal, m.n_custs, mo.mode_nation, mo.mode_count
FROM med m JOIN modes mo USING (c_mktsegment)
"""

register(QuerySpec("a10_median_mode", a10_median_mode, A10_ORACLE,
                   tags=("A4", "window-census")))


def w7_trailing_range_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window census: each order's trailing-30-day customer
    spend (inclusive).  RANGE frames bound by VALUE, not row count —
    same-day orders all fall in each other's frame, so the result is
    deterministic under ties (unlike a ROWS frame over a non-unique
    ordering).  Dates become day numbers because Spark's DataFrame
    rangeBetween is numeric."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("__p"),
    ).withColumn(
        "day_num", F.datediff("d", F.lit("1995-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "d",
        F.sum("__p").over(w).cast("double").alias("trailing_30d_spend"),
        F.count("*").over(w).alias("trailing_30d_orders"),
    )


W7_ORACLE = """
WITH t AS (
  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_num
  FROM orders
)
SELECT o_orderkey, o_custkey, d,
       CAST(SUM(p) OVER w AS DOUBLE) AS trailing_30d_spend,
       COUNT(*) OVER w AS trailing_30d_orders
FROM t
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
"""

register(QuerySpec("w7_trailing_range_spend", w7_trailing_range_spend,
                   W7_ORACLE, tags=("W3", "window-census")))


def a11_statistical_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate census — mean / variance / stddev /
    covariance / correlation per return flag — derived from
    DECIMAL-EXACT moment sums (Σx, Σx², Σxy) instead of the engines'
    native float aggregates, whose accumulation order (and Welford
    variants) differ across engines and partitionings.

    Scale: one partial-agg-friendly hash aggregate (map-side combine on
    the 3-value flag key); the double math happens on k aggregated rows.
    Decimal scales are sized so every unscaled sum stays < 2^53 (the
    cross-engine decimal→double trap)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_d = F.col("l_quantity").cast("decimal(18,2)")
    dis_d = F.col("l_discount").cast("decimal(8,4)")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qty_d).cast("double").alias("s_q"),
        F.sum(qty_d * qty_d).cast("decimal(32,4)").cast("double").alias("s_qq"),
        F.sum(dis_d).cast("double").alias("s_d"),
        F.sum(dis_d * dis_d).cast("decimal(32,8)").cast("double").alias("s_dd"),
        F.sum(qty_d * dis_d).cast("decimal(32,6)").cast("double").alias("s_qd"),
    )
    n = F.col("n").cast("double")
    var_q = (F.col("s_qq") - F.col("s_q") * F.col("s_q") / n) / (n - 1)
    var_d = (F.col("s_dd") - F.col("s_d") * F.col("s_d") / n) / (n - 1)
    cov = (F.col("s_qd") - F.col("s_q") * F.col("s_d") / n) / (n - 1)
    return agg.select(
        "l_returnflag",
        "n",
        (F.col("s_q") / n).alias("mean_qty"),
        var_q.alias("var_qty"),
        F.sqrt(var_q).alias("stddev_qty"),
        cov.alias("covar_qty_disc"),
        (cov / (F.sqrt(var_q) * F.sqrt(var_d))).alias("corr_qty_disc"),
    )


A11_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_q,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(32,4))
              AS DOUBLE) AS s_qq,
         CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS s_d,
         CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))
                       * CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(32,8))
              AS DOUBLE) AS s_dd,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(32,6))
              AS DOUBLE) AS s_qd
  FROM lineitem
  GROUP BY 1
)
SELECT l_returnflag,
       n,
       s_q / n AS mean_qty,
       (s_qq - s_q * s_q / n) / (n - 1) AS var_qty,
       sqrt((s_qq - s_q * s_q / n) / (n - 1)) AS stddev_qty,
       (s_qd - s_q * s_d / n) / (n - 1) AS covar_qty_disc,
       ((s_qd - s_q * s_d / n) / (n - 1))
         / (sqrt((s_qq - s_q * s_q / n) / (n - 1))
            * sqrt((s_dd - s_d * s_d / n) / (n - 1))) AS corr_qty_disc
FROM m
"""

register(QuerySpec("a11_statistical_moments", a11_statistical_moments,
                   A11_ORACLE, tags=("A2", "A6", "§2.8")))


def w8_distinct_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) OVER a window — Spark has no native distinct
    window aggregate; the idiomatic workaround is
    ``size(collect_set(x) OVER w)``.  Emitted at the partition grain so
    the result is the same relation a GROUP BY would produce (which is
    exactly what the oracle runs).

    Scale: collect_set state is bounded by per-key distinct cardinality
    (suppliers per order — small); for unbounded-cardinality keys the
    escape hatch is the groupBy twin or approx_count_distinct."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return (
        li.select(
            "l_orderkey",
            F.size(F.collect_set("l_suppkey").over(w)).alias("n_distinct_supp"),
            F.count("*").over(w).alias("n_lines"),
        )
        .distinct()
    )


W8_ORACLE = """
SELECT l_orderkey,
       CAST(COUNT(DISTINCT l_suppkey) AS INTEGER) AS n_distinct_supp,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY 1
"""

register(QuerySpec("w8_distinct_over_window", w8_distinct_over_window,
                   W8_ORACLE, tags=("W3", "A3", "window-census")))


# --- UNPIVOT / melt ---------------------------------------------------------


def upv1_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): a wide per-priority aggregate turned into long
    (priority, metric, value) rows via ``stack`` — the inverse of the
    pv1 pivot, completing the reshape surface.  stack() is a generator
    (map-side, no shuffle beyond the one aggregation); money goes
    through the decimal-exact sum before the reshape."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'n_orders', cast(n_orders as double), "
        "'total_price', total_price, "
        "'n_customers', cast(n_customers as double)) as (metric, value)",
    )


UPV1_ORACLE = """
WITH wide AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price,
         COUNT(DISTINCT o_custkey) AS n_customers
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, 'n_orders' AS metric,
       CAST(n_orders AS DOUBLE) AS value FROM wide
UNION ALL
SELECT o_orderpriority, 'total_price', total_price FROM wide
UNION ALL
SELECT o_orderpriority, 'n_customers', CAST(n_customers AS DOUBLE) FROM wide
"""

register(QuerySpec("upv1_unpivot", upv1_unpivot, UPV1_ORACLE,
                   tags=("PV1", "A1")))
