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


def ivm_join_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view IVM: maintain V = orders ⋈ customer under insert deltas
    on BOTH sides (new orders AND newly-arrived customers in the same
    batch), then return V_old ∪ ΔV.  The oracle is the full join over
    the unioned inputs, so the identity Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪
    ΔA⋈ΔB is value-hash-proven, not just unit-tested."""
    from star_schema_etl_airflow_spark.operators.ivm import ivm_join_delta

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    a_old = orders.filter(F.col("o_orderkey") % 7 != 0)
    a_delta = orders.filter(F.col("o_orderkey") % 7 == 0)
    b_old = cust.filter(F.col("o_custkey") % 5 != 0)
    b_delta = cust.filter(F.col("o_custkey") % 5 == 0)

    v_old = a_old.join(b_old, "o_custkey")
    dv = ivm_join_delta(a_old, a_delta, b_old, b_delta, "o_custkey")
    return v_old.unionByName(dv).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "c_name", "c_nationkey",
    )


IVM_JOIN_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderstatus,
       c.c_name, c.c_nationkey
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
"""

register(QuerySpec("ivm_join_orders_customers", ivm_join_orders_customers,
                   IVM_JOIN_ORACLE, tags=("IVM",)))


def ivm_counting_returnflags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counting IVM under INSERT AND DELETE deltas: maintain the
    per-(returnflag, linestatus) count/quantity rollup through
    (1) an initial load, (2) an insert batch, (3) a DELETE batch, and
    require the result to equal the direct aggregate over the net
    multiset — deletes are the case plain additive IVM cannot express."""
    from star_schema_etl_airflow_spark.operators.ivm import (
        ivm_counting_merge,
        ivm_counting_state,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity",
    )
    keys = ["l_returnflag", "l_linestatus"]
    initial = li.filter(F.col("l_orderkey") % 3 != 0)
    inserted = li.filter(F.col("l_orderkey") % 3 == 0)
    # delete a subset of what is now present (rows from both batches)
    deleted = li.filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 2 == 0)
    )
    state = ivm_counting_merge(
        ivm_counting_state(initial, keys, "l_quantity", +1),
        ivm_counting_state(inserted, keys, "l_quantity", +1),
        ivm_counting_state(deleted, keys, "l_quantity", -1),
    )
    return state.select(
        *keys,
        F.col("mult").alias("n_lines"),
        # decimal internal, double at the edge (driver dtype parity)
        F.col("vsum").cast("decimal(38,2)").cast("double").alias("sum_qty"),
    )


IVM_COUNTING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS sum_qty
FROM lineitem
WHERE NOT (l_linenumber = 1 AND l_orderkey % 2 = 0)
GROUP BY 1, 2
"""

register(QuerySpec("ivm_counting_returnflags", ivm_counting_returnflags,
                   IVM_COUNTING_ORACLE, tags=("IVM",)))


def ivm_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counting IVM on the MONITORING grain: maintain the per-(type,
    hour) count/value rollup that ``plans/anomaly.py`` (EWMA, z-score,
    Holt, forecast_eval) reads — through an initial load, a late-arrival
    insert batch, and a bot-traffic RETRACTION batch (every 50th user's
    events withdrawn after classification).  The oracle is the direct
    aggregate over the net multiset, so the check proves the hourly
    continuous aggregate can be maintained by deltas instead of
    event-scan rebuilds — the claim the anomaly module's scale note
    makes, now oracle-backed."""
    from star_schema_etl_airflow_spark.operators.ivm import (
        ivm_counting_merge,
        ivm_counting_state,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
        "value",
        "event_id",
        "user_id",
    )
    keys = ["event_type", "hour"]
    initial = ev.filter(F.col("event_id") % 4 != 0)
    inserted = ev.filter(F.col("event_id") % 4 == 0)   # late arrivals
    retracted = ev.filter(F.col("user_id") % 50 == 0)  # bot classification
    state = ivm_counting_merge(
        ivm_counting_state(initial, keys, "value", +1),
        ivm_counting_state(inserted, keys, "value", +1),
        ivm_counting_state(retracted, keys, "value", -1),
    )
    return state.select(
        "event_type",
        "hour",
        F.col("mult").alias("cnt"),
        F.col("vsum").cast("double").alias("sum_value"),
    )


IVM_HOURLY_ORACLE = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS sum_value
FROM events
WHERE user_id % 50 <> 0
GROUP BY 1, 2
"""

register(QuerySpec("ivm_hourly_events", ivm_hourly_events,
                   IVM_HOURLY_ORACLE, tags=("IVM", "TIMESERIES")))
