"""Oracle-checked queries for the small operator families of SURVEY.md §2:
projections/filters/predicates (P1-P8), joins (J1-J3), aggregations
(A4, A5), the surrogate-key window (W1), and the date generator (G1).

Each function is deliberately minimal — one operator family per query — so
the driver's CORRECTNESS report maps 1:1 onto the §2 inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.pit import as_of_join
from star_schema_etl_airflow_spark.operators.scd2 import classify_changes
from star_schema_etl_airflow_spark.plans.dims import (
    SCD2_CUSTOMER_DIM_SQL,
    build_date_dim,
    synthetic_scd2_customer_dim,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

# --- P1: column projection (incl. computed columns; stays in codegen) -----


def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("discounted_price"),
        (F.col("l_extendedprice") * (1 + F.col("l_tax"))).alias("gross_price"),
    )


P1_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       l_extendedprice * (1 - l_discount) AS discounted_price,
       l_extendedprice * (1 + l_tax)      AS gross_price
FROM lineitem
"""

# --- P2/P3: partition-date filters (prune to one day, the reference's
#     {{dstart}} pattern, dim_customers.sql:28 / sales_summary.sql:36) ----

P2_DATE = "1997-03-15"
P3_DATE = "1997-06-15"


def p2_ship_date_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.to_date("l_shipdate") == F.lit(P2_DATE).cast("date")).select(
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("ship_date"),
        "l_quantity",
    )


P2_ORACLE = f"""
SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, l_quantity
FROM lineitem WHERE CAST(l_shipdate AS DATE) = DATE '{P2_DATE}'
"""


def p3_order_date_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.to_date("o_orderdate") == F.lit(P3_DATE).cast("date")).select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("order_date"),
        "o_totalprice",
    )


P3_ORACLE = f"""
SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
FROM orders WHERE CAST(o_orderdate AS DATE) = DATE '{P3_DATE}'
"""

# --- P5 (+J3/P8): NULL-safe change classification --------------------------


def p5_change_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic daily slice vs current dim: new/changed/unchanged, with a
    NULL→value transition that plain ``!=`` would miss (ref bug #5)."""
    c = load_table(spark, sf_dir, "customer")
    src = (
        c.filter(F.col("c_custkey") % 3 != 0)
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("c_mktsegment"))
            .alias("mktsegment"),
            F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 10.0)
            .otherwise(F.col("c_acctbal"))
            .alias("acctbal"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 25 == 0).select(
                (F.col("c_custkey") + 1000000).alias("customer_id"),
                F.col("c_name").alias("customer_name"),
                F.col("c_mktsegment").alias("mktsegment"),
                F.col("c_acctbal").alias("acctbal"),
            )
        )
    )
    dim = synthetic_scd2_customer_dim(spark, sf_dir)
    cur = dim.filter("is_current")
    return classify_changes(
        src, cur, "customer_id", ["customer_name", "mktsegment", "acctbal"]
    ).select("customer_id", "mktsegment", "acctbal", "change_type")


P5_ORACLE = f"""
WITH dim AS ({SCD2_CUSTOMER_DIM_SQL}),
src AS (
  SELECT c_custkey AS customer_id, c_name AS customer_name,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS mktsegment,
         CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END AS acctbal
  FROM customer WHERE c_custkey % 3 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey % 25 = 0
),
cur AS (SELECT * FROM dim WHERE is_current)
SELECT s.customer_id, s.mktsegment, s.acctbal,
       CASE WHEN t.customer_id IS NULL THEN 'new'
            WHEN (t.customer_name IS DISTINCT FROM s.customer_name)
              OR (t.mktsegment    IS DISTINCT FROM s.mktsegment)
              OR (t.acctbal       IS DISTINCT FROM s.acctbal) THEN 'changed'
            ELSE 'unchanged' END AS change_type
FROM src s LEFT JOIN cur t ON s.customer_id = t.customer_id
"""

# --- P6: CASE WHEN conditional projection ----------------------------------


def p6_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    seg = (
        F.when(F.col("c_acctbal") >= 8000, "platinum")
        .when(F.col("c_acctbal") >= 5000, "gold")
        .when(F.col("c_acctbal") >= 2000, "silver")
        .when(F.col("c_acctbal") >= 0, "bronze")
        .otherwise("debt")
    )
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_acctbal").alias("acctbal"),
        seg.alias("balance_segment"),
    )


P6_ORACLE = """
SELECT c_custkey AS customer_id, c_acctbal AS acctbal,
       CASE WHEN c_acctbal >= 8000 THEN 'platinum'
            WHEN c_acctbal >= 5000 THEN 'gold'
            WHEN c_acctbal >= 2000 THEN 'silver'
            WHEN c_acctbal >= 0    THEN 'bronze'
            ELSE 'debt' END AS balance_segment
FROM customer
"""

# --- J3 + P7 + P8: left join, COALESCE, IS NULL ----------------------------


def p7_p8_left_join_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_name")
    )
    return (
        o.join(F.broadcast(rich), o.o_custkey == rich.c_custkey, "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("c_name"), F.lit("(no profile)")).alias("customer_name"),
            F.col("c_name").isNotNull().alias("has_profile"),
        )
    )


P7_P8_ORACLE = """
SELECT o.o_orderkey,
       COALESCE(c.c_name, '(no profile)') AS customer_name,
       c.c_name IS NOT NULL               AS has_profile
FROM orders o
LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000) c
  ON o.o_custkey = c.c_custkey
"""

# --- J1: inner equi-join (order header × line items) -----------------------


def j1_order_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return o.join(li, o.o_orderkey == li.l_orderkey, "inner").select(
        "o_orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        "l_quantity",
        "l_extendedprice",
    )


J1_ORACLE = """
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
       l.l_quantity, l.l_extendedprice
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
"""

# --- J2: point-in-time (as-of) join ----------------------------------------


def j2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("order_date")
    )
    dim = synthetic_scd2_customer_dim(spark, sf_dir)
    return as_of_join(
        orders, dim, fact_key="o_custkey", dim_key="customer_id", as_of="order_date"
    ).select(
        "o_orderkey",
        "order_date",
        "customer_sk",
        F.col("acctbal").alias("customer_acctbal"),
        "is_current",
    )


J2_ORACLE = f"""
WITH dim AS ({SCD2_CUSTOMER_DIM_SQL})
SELECT o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       d.customer_sk,
       d.acctbal AS customer_acctbal,
       d.is_current
FROM orders o
JOIN dim d
  ON o.o_custkey = d.customer_id
 AND CAST(o.o_orderdate AS DATE) >= d.effective_date
 AND (d.expiration_date IS NULL OR CAST(o.o_orderdate AS DATE) < d.expiration_date)
"""

# --- A4: MIN/MAX over groups ------------------------------------------------


def a4_minmax_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.min(F.to_date("o_orderdate")).alias("first_order_date"),
            F.max(F.to_date("o_orderdate")).alias("last_order_date"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.count("*").alias("n_orders"),
        )
    )


A4_ORACLE = """
SELECT o_orderpriority,
       MIN(CAST(o_orderdate AS DATE)) AS first_order_date,
       MAX(CAST(o_orderdate AS DATE)) AS last_order_date,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""

# --- A5 + P7: scalar-subquery aggregate (surrogate-key seed) ----------------


def a5_max_sk_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.agg(F.coalesce(F.max("c_custkey"), F.lit(0)).alias("max_sk"))


A5_ORACLE = "SELECT COALESCE(MAX(c_custkey), 0) AS max_sk FROM customer"

# --- W1: deterministic surrogate-key window ---------------------------------


def w1_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_sk + row_number() ORDER BY business key (ref dim_customers.sql:76
    made deterministic).  The window is global but runs over the *delta*
    (new rows only) — dimension-delta-sized, not fact-sized."""
    c = load_table(spark, sf_dir, "customer")
    existing = c.filter(F.col("c_custkey") % 3 != 0)
    newbies = c.filter(F.col("c_custkey") % 3 == 0)
    max_sk = existing.agg(
        F.coalesce(F.max("c_custkey"), F.lit(0)).alias("__max_sk")
    )
    w = Window.orderBy("c_custkey")
    return (
        newbies.crossJoin(F.broadcast(max_sk))
        .select(
            F.col("c_custkey").alias("customer_id"),
            (F.col("__max_sk") + F.row_number().over(w)).cast("long").alias("customer_sk"),
        )
    )


W1_ORACLE = """
SELECT c_custkey AS customer_id,
       CAST((SELECT COALESCE(MAX(c_custkey), 0) FROM customer WHERE c_custkey % 3 <> 0)
            + ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS customer_sk
FROM customer WHERE c_custkey % 3 = 0
"""

# --- G1 + §2.8 census: generated date dimension -----------------------------

G1_START, G1_END = "1995-01-01", "1998-12-31"


def g1_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_date_dim(spark, G1_START, G1_END)


G1_ORACLE = f"""
WITH days AS (
  SELECT CAST(g AS DATE) AS full_date
  FROM generate_series(DATE '{G1_START}', DATE '{G1_END}', INTERVAL 1 DAY) AS t(g)
),
parts AS (
  SELECT full_date,
         dayofyear(full_date) AS doy,
         dayofweek(date_trunc('year', full_date)) + 1 AS j,  -- 1=Sunday
         CAST(EXTRACT(MONTH FROM full_date) AS INTEGER) AS m,
         CAST(EXTRACT(YEAR FROM full_date) AS INTEGER) AS y
  FROM days
)
SELECT
  full_date AS date_id,
  full_date,
  y AS "year",
  CAST(EXTRACT(QUARTER FROM full_date) AS INTEGER) AS quarter,
  m AS "month",
  monthname(full_date) AS month_name,
  CAST(CASE WHEN doy < ((8 - j) % 7) + 1 THEN 0
            ELSE ((doy - (((8 - j) % 7) + 1)) // 7) + 1 END AS INTEGER) AS week_of_year,
  CAST(EXTRACT(DAY FROM full_date) AS INTEGER) AS day_of_month,
  CAST(dayofweek(full_date) + 1 AS INTEGER) AS day_of_week,
  dayname(full_date) AS day_name,
  dayofweek(full_date) IN (0, 6) AS is_weekend,
  CAST(CASE WHEN m >= 7 THEN y ELSE y - 1 END AS INTEGER) AS fiscal_year,
  CASE WHEN strftime(full_date, '%m-%d') = '01-01' THEN 'New Year''s Day'
       WHEN strftime(full_date, '%m-%d') = '07-04' THEN 'Independence Day'
       WHEN strftime(full_date, '%m-%d') = '12-25' THEN 'Christmas Day'
       ELSE NULL END AS holiday_name,
  strftime(full_date, '%m-%d') IN ('01-01', '07-04', '12-25') AS is_holiday
FROM parts
"""

# --- registrations ----------------------------------------------------------

register(QuerySpec("p1_projection", p1_projection, P1_ORACLE, tags=("P1",)))
register(QuerySpec("p2_ship_date_filter", p2_ship_date_filter, P2_ORACLE, tags=("P2",)))
register(QuerySpec("p3_order_date_filter", p3_order_date_filter, P3_ORACLE, tags=("P3",)))
register(QuerySpec(
    "p5_change_classification", p5_change_classification, P5_ORACLE,
    tags=("P5", "J3", "P8"),
))
register(QuerySpec("p6_case_buckets", p6_case_buckets, P6_ORACLE, tags=("P6",)))
register(QuerySpec(
    "p7_p8_left_join_nulls", p7_p8_left_join_nulls, P7_P8_ORACLE,
    tags=("J3", "P7", "P8"),
))
register(QuerySpec("j1_order_lineitem_join", j1_order_lineitem_join, J1_ORACLE, tags=("J1",)))
register(QuerySpec("j2_pit_join", j2_pit_join, J2_ORACLE, headline=True, tags=("J2",)))
register(QuerySpec("a4_minmax_by_priority", a4_minmax_by_priority, A4_ORACLE, tags=("A4",)))
register(QuerySpec("a5_max_sk_seed", a5_max_sk_seed, A5_ORACLE, tags=("A5", "P7")))
register(QuerySpec("w1_surrogate_keys", w1_surrogate_keys, W1_ORACLE, tags=("W1",)))
register(QuerySpec("g1_date_dim", g1_date_dim, G1_ORACLE, tags=("G1",)))


# --- P4: current-version filter -------------------------------------------


def p4_current_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_current = TRUE as WHERE (customer_analytics.sql:44) over the
    synthetic SCD2 dimension — prunes to the open versions."""
    dim = synthetic_scd2_customer_dim(spark, sf_dir)
    return dim.filter(F.col("is_current")).select(
        "customer_sk", "customer_id", "mktsegment", "effective_date"
    )


P4_ORACLE = f"""
WITH dim AS ({SCD2_CUSTOMER_DIM_SQL})
SELECT customer_sk, customer_id, mktsegment, effective_date
FROM dim WHERE is_current
"""

register(QuerySpec("p4_current_filter", p4_current_filter, P4_ORACLE, tags=("P4",)))


# --- snapshot diff: CDC-style change classification ------------------------


def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two derived snapshots of the customer table (removed %7 keys,
    +250 balance on %4==1, added %9 keys under new ids) — the full CDC
    taxonomy (added/removed/changed/unchanged) from one full-outer join."""
    from star_schema_etl_airflow_spark.operators.diff import snapshot_diff

    c = load_table(spark, sf_dir, "customer")
    old = c.select(
        F.col("c_custkey").alias("customer_id"),
        "c_name", "c_mktsegment", "c_acctbal",
    )
    new = old.filter(F.col("customer_id") % 7 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("customer_id") % 4 == 1, F.col("c_acctbal") + 250.0)
        .otherwise(F.col("c_acctbal")),
    ).unionByName(
        old.filter(F.col("customer_id") % 9 == 0).withColumn(
            "customer_id", F.col("customer_id") + 3000000
        )
    )
    return snapshot_diff(old, new, keys=["customer_id"])


SNAPSHOT_DIFF_ORACLE = """
WITH old AS (
  SELECT c_custkey AS customer_id, c_name, c_mktsegment, c_acctbal
  FROM customer
),
new AS (
  SELECT customer_id, c_name, c_mktsegment,
         CASE WHEN customer_id % 4 = 1 THEN c_acctbal + 250.0
              ELSE c_acctbal END AS c_acctbal
  FROM old WHERE customer_id % 7 <> 0
  UNION ALL
  SELECT customer_id + 3000000, c_name, c_mktsegment, c_acctbal
  FROM old WHERE customer_id % 9 = 0
)
SELECT COALESCE(o.customer_id, n.customer_id) AS customer_id,
       CASE WHEN o.customer_id IS NULL THEN 'added'
            WHEN n.customer_id IS NULL THEN 'removed'
            WHEN o.c_name       IS DISTINCT FROM n.c_name
              OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
              OR o.c_acctbal    IS DISTINCT FROM n.c_acctbal THEN 'changed'
            ELSE 'unchanged' END AS change_type
FROM old o FULL OUTER JOIN new n ON o.customer_id = n.customer_id
"""

register(QuerySpec("snapshot_diff_customers", snapshot_diff_customers,
                   SNAPSHOT_DIFF_ORACLE, tags=("CDC", "J3", "P5")))


# --- scalar-function censuses beyond §2.8 ----------------------------------


def fn_string_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function parity census (the §2.8 pattern extended to the
    string surface): each column is one engine builtin with an exact
    DuckDB twin, so any cross-engine semantic drift pins to a column."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.expr("levenshtein(c_name, c_mktsegment)").alias("lev_name_seg"),
        F.expr("translate(c_mktsegment, 'AEIOU', '_____')").alias("seg_masked"),
        F.expr("reverse(c_name)").alias("name_rev"),
        F.expr("lpad(cast(c_custkey as string), 9, '0')").alias("key_padded"),
        F.expr("repeat('=', cast(c_custkey % 5 as int))").alias("bar"),
        F.expr("substring(c_name, 3, 5)").alias("name_mid"),
        F.expr("cast(instr(c_name, '0') as int)").alias("zero_pos"),
    )


FN_STRING_ORACLE = """
SELECT c_custkey AS customer_id,
       CAST(levenshtein(c_name, c_mktsegment) AS INTEGER) AS lev_name_seg,
       translate(c_mktsegment, 'AEIOU', '_____') AS seg_masked,
       reverse(c_name) AS name_rev,
       lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS key_padded,
       repeat('=', CAST(c_custkey % 5 AS INTEGER)) AS bar,
       substring(c_name, 3, 5) AS name_mid,
       CAST(instr(c_name, '0') AS INTEGER) AS zero_pos
FROM customer
"""


def fn_date_census2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function parity census #2 (beyond the dim_dates attributes):
    month-end, offset arithmetic, day-diff, day-of-year, ISO week."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("last_day(o_orderdate)").alias("month_end"),
        F.expr("date_add(o_orderdate, 30)").alias("plus_30"),
        F.expr("datediff(o_orderdate, date'1995-01-01')").alias("d_since"),
        F.expr("dayofyear(o_orderdate)").alias("doy"),
        F.expr("weekofyear(o_orderdate)").alias("wk_iso"),
    )


FN_DATE2_ORACLE = """
SELECT o_orderkey,
       last_day(o_orderdate) AS month_end,
       o_orderdate + INTERVAL 30 DAY AS plus_30,
       CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER)
         AS d_since,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS wk_iso
FROM orders
"""

register(QuerySpec("fn_string_census", fn_string_census, FN_STRING_ORACLE,
                   tags=("§2.8",)))
register(QuerySpec("fn_date_census2", fn_date_census2, FN_DATE2_ORACLE,
                   tags=("§2.8",)))


def fn_array_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function parity census: lambda transforms,
    filters, folds, zips, quantifiers and array utilities, each with an
    exact DuckDB list-function twin.  Arrays are derived from the key
    via ``sequence`` so both engines build identical inputs.

    Every array-valued result is emitted '|'-joined (the arrays stay
    internal): the differential harness canonicalizes through pandas,
    which cannot hash/sort list-typed cells.

    Scale: all higher-order functions run inside codegen over
    per-row arrays — a pure map stage, no shuffle, no Python."""

    def joined(expr: str, alias: str):
        return F.expr(
            f"array_join(transform({expr}, x -> cast(x as string)), '|')"
        ).alias(alias)

    seq = "sequence(1, cast(c_custkey % 8 + 3 as int))"
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        joined(seq, "arr"),
        joined(f"transform({seq}, x -> x * x)", "sq"),
        joined(f"filter({seq}, x -> x % 2 = 0)", "evens"),
        F.expr(f"aggregate({seq}, 0L, (acc, x) -> acc + x)").alias("total"),
        joined(f"zip_with({seq}, reverse({seq}), (x, y) -> x * y)", "dotrev"),
        F.expr(f"exists({seq}, x -> x > 5)").alias("has_gt5"),
        F.expr(f"forall({seq}, x -> x < 9)").alias("all_lt9"),
        joined(f"flatten(array({seq}, {seq}))", "flat2"),
        joined(f"slice({seq}, 2, 3)", "mid"),
        F.expr(f"cast(array_position({seq}, 3) as bigint)").alias("pos3"),
        F.expr(f"cast(array_max({seq}) as bigint)").alias("amax"),
        joined(f"sort_array({seq}, false)", "asort_desc"),
    )


FN_ARRAY_ORACLE = """
WITH base AS (
  SELECT c_custkey,
         range(1, CAST(c_custkey % 8 + 3 AS INTEGER) + 1) AS arr
  FROM customer
)
SELECT c_custkey AS customer_id,
       array_to_string(arr, '|') AS arr,
       array_to_string(list_transform(arr, x -> x * x), '|') AS sq,
       array_to_string(list_filter(arr, x -> x % 2 = 0), '|') AS evens,
       CAST(list_sum(arr) AS BIGINT) AS total,
       array_to_string(list_transform(range(1, len(arr) + 1),
                       i -> arr[i] * list_reverse(arr)[i]), '|') AS dotrev,
       len(list_filter(arr, x -> x > 5)) > 0 AS has_gt5,
       len(list_filter(arr, x -> x >= 9)) = 0 AS all_lt9,
       array_to_string(flatten([arr, arr]), '|') AS flat2,
       array_to_string(arr[2:4], '|') AS mid,
       CAST(list_position(arr, 3) AS BIGINT) AS pos3,
       CAST(list_max(arr) AS BIGINT) AS amax,
       array_to_string(list_sort(arr, 'DESC'), '|') AS asort_desc
FROM base
"""

register(QuerySpec("fn_array_census", fn_array_census, FN_ARRAY_ORACLE,
                   tags=("§2.8",)))


def gen_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (LATERAL VIEW posexplode / UNNEST WITH
    ORDINALITY): row-generating expansion that keeps the element index —
    the building block for order-preserving array pipelines (shingles,
    frame sampling, beam traces).

    Scale: generators are pure map-side row expansion (no shuffle);
    the fan-out factor is the array length, visible and bounded."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            F.col("c_custkey").alias("customer_id"),
            F.expr("sequence(1, cast(c_custkey % 4 + 2 as int))").alias("arr"),
        )
        .select(
            "customer_id",
            F.posexplode("arr").alias("pos", "elem"),
        )
        .select(
            "customer_id",
            "pos",
            (F.col("elem").cast("bigint") * 10).alias("val"),
        )
    )


GEN_POSEXPLODE_ORACLE = """
WITH base AS (
  SELECT c_custkey, range(1, CAST(c_custkey % 4 + 2 AS INTEGER) + 1) AS arr
  FROM customer
)
SELECT c_custkey AS customer_id,
       CAST(i - 1 AS INTEGER) AS pos,
       CAST(arr[i] * 10 AS BIGINT) AS val
FROM base, UNNEST(range(1, len(arr) + 1)) AS u(i)
"""


def fn_null_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling function census: NULLIF, IFNULL/NVL, NVL2,
    GREATEST/LEAST null-skipping, and coalesce chains — the P7/P8
    surface generalized."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    bal = F.col("c_acctbal")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg_nb"),
        F.expr("ifnull(nullif(c_mktsegment, 'BUILDING'), 'OTHER')").alias("seg_or"),
        F.expr("nvl2(nullif(c_mktsegment, 'BUILDING'), 'kept', 'blanked')")
        .alias("seg_tag"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor"),
        F.least(bal, F.expr("cast(null as double)"), F.lit(1000.0)).alias("bal_cap"),
        F.coalesce(F.expr("nullif(c_mktsegment, 'BUILDING')"), seg, F.lit("?"))
        .alias("seg_chain"),
    )


FN_NULL_ORACLE = """
SELECT c_custkey AS customer_id,
       nullif(c_mktsegment, 'BUILDING') AS seg_nb,
       ifnull(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or,
       CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
            THEN 'kept' ELSE 'blanked' END AS seg_tag,
       greatest(c_acctbal, 0.0) AS bal_floor,
       least(c_acctbal, CAST(NULL AS DOUBLE), 1000.0) AS bal_cap,
       coalesce(nullif(c_mktsegment, 'BUILDING'), c_mktsegment, '?') AS seg_chain
FROM customer
"""

register(QuerySpec("gen_posexplode", gen_posexplode, GEN_POSEXPLODE_ORACLE,
                   tags=("G1",)))
register(QuerySpec("fn_null_census", fn_null_census, FN_NULL_ORACLE,
                   tags=("P7", "P8", "§2.8")))


def a12_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string aggregation per group, made deterministic by
    sorting the collected values (collect_list order is partition-
    dependent; the sort pins it under any partitioning — the same
    determinism rule the money sums follow).

    Scale: collect_list is a real memory risk on skewed groups — this
    query bounds it by aggregating a capped slice (keys < 200).  The
    documented alternative for unbounded groups is top-N-per-group
    (`tn1_top_parts_per_nation`) or an explicit sample."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"),
        F.count("*").alias("n"),
    )


A12_ORACLE = """
SELECT c_mktsegment,
       string_agg(c_name, ',' ORDER BY c_name) AS names,
       COUNT(*) AS n
FROM customer
WHERE c_custkey < 200
GROUP BY 1
"""


def fn_regex_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-function parity census: extract, global replace, match
    test, and regex split.  Patterns stay in the POSIX-common subset
    where Java (Spark) and RE2-ish (DuckDB) dialects agree — the same
    subset the PII scrubber (`llm_text.pii_scrub`) restricts itself to.

    ``parts`` is emitted '|'-joined (scalar canonical form — the
    differential harness cannot hash list-typed cells)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
        F.col("c_name").rlike("^Customer").alias("is_cust"),
        F.array_join(F.split("c_name", "[_#]"), "|").alias("parts"),
    )


FN_REGEX_ORACLE = """
SELECT c_custkey AS customer_id,
       regexp_extract(c_name, '[0-9]+') AS digits,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
       regexp_matches(c_name, '^Customer') AS is_cust,
       array_to_string(string_split_regex(c_name, '[_#]'), '|') AS parts
FROM customer
"""

register(QuerySpec("a12_string_agg", a12_string_agg, A12_ORACLE,
                   tags=("A1", "§2.8")))
register(QuerySpec("fn_regex_census", fn_regex_census, FN_REGEX_ORACLE,
                   tags=("§2.8",)))
