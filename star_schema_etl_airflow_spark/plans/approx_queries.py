"""Approximate-algorithm operators with *bound-checked* oracles, the
data-quality gate, and the runtime-bloom-pruned join.

Approximate results (HLL distinct counts, t-digest-style quantiles) can't be
hash-compared against an exact oracle directly — the whole point is that
they differ.  The differential trick used here: the Spark side computes BOTH
the exact value and the approximation, and emits the exact value plus a
boolean ``within_bound``; the oracle emits the exact value plus literal
TRUE.  The hash matches iff the approximation actually met its advertised
error bound on this data — the property a user of ``approx_count_distinct``
/ ``percentile_approx`` is relying on at 100 TB, where the exact versions
need a full shuffle of the key space and the sketches need one small merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.quality import (
    Rule,
    check,
    in_range,
    in_set,
    not_null,
)
from star_schema_etl_airflow_spark.operators.runtime_filter import pruned_fact_join
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

# --- HLL distinct vs exact, 5% bound --------------------------------------

_HLL_RSD = 0.02
_HLL_BOUND = 0.05


def approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", _HLL_RSD).alias("__approx"),
        )
        .select(
            "o_orderpriority",
            "exact_customers",
            (
                F.abs(F.col("__approx") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= _HLL_BOUND
            ).alias("within_bound"),
        )
    )


APPROX_DISTINCT_ORACLE = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS within_bound
FROM orders GROUP BY o_orderpriority
"""

# --- approximate quantiles vs exact, 2% relative bound --------------------

_PCT_ACCURACY = 5000
_PCT_BOUND = 0.02


def approx_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def ok(approx: F.Column, exact: F.Column) -> F.Column:
        return (F.abs(approx - exact) / exact) <= _PCT_BOUND

    agg = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("__e50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("__e95"),
        F.percentile_approx("o_totalprice", 0.5, _PCT_ACCURACY).alias("__a50"),
        F.percentile_approx("o_totalprice", 0.95, _PCT_ACCURACY).alias("__a95"),
    )
    return agg.select(
        "o_orderpriority",
        ok(F.col("__a50"), F.col("__e50")).alias("q50_within_bound"),
        ok(F.col("__a95"), F.col("__e95")).alias("q95_within_bound"),
    )


APPROX_QUANTILE_ORACLE = """
SELECT o_orderpriority,
       TRUE AS q50_within_bound,
       TRUE AS q95_within_bound
FROM orders GROUP BY o_orderpriority
"""

# --- DQ1: data-quality rule report over lineitem --------------------------


def _lineitem_rules() -> list[Rule]:
    return [
        Rule("quantity_positive", F.col("l_quantity") > 0),
        Rule("discount_in_unit_range", in_range("l_discount", 0.0, 1.0)),
        Rule("tax_nonnegative", F.col("l_tax") >= 0),
        Rule("price_positive", F.col("l_extendedprice") > 0),
        Rule("shipdate_not_null", not_null("l_shipdate")),
        Rule("returnflag_known", in_set("l_returnflag", ["A", "N", "R"])),
    ]


def dq1_lineitem_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return check(load_table(spark, sf_dir, "lineitem"), _lineitem_rules())


_DQ1_CASES = {
    "quantity_positive": "l_quantity > 0",
    "discount_in_unit_range": "l_discount BETWEEN 0.0 AND 1.0",
    "tax_nonnegative": "l_tax >= 0",
    "price_positive": "l_extendedprice > 0",
    "shipdate_not_null": "l_shipdate IS NOT NULL",
    "returnflag_known": "l_returnflag IN ('A', 'N', 'R')",
}

DQ1_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS rule,
       CAST(COALESCE(SUM(CASE WHEN NOT ({good}) THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS violations,
       CAST(COUNT(*) AS BIGINT) AS total_rows
FROM lineitem"""
    for name, good in _DQ1_CASES.items()
)

# --- J8: selective dim join, runtime-bloom-prunable -----------------------

J8_SIZES = (7, 14, 21)


def j8_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective part filter ⋈ lineitem — the join shape Catalyst's runtime
    bloom filter targets (see ``operators/runtime_filter.py``; injection is
    pinned by ``tests/test_analytics.py`` with broadcast disabled).  Results
    are bloom-independent (exact join applies regardless), so one oracle
    covers both the broadcast and the bloom-pruned physical plans."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(*J8_SIZES))
        .select("p_partkey", "p_size")
    )
    return (
        pruned_fact_join(li, pt, "l_partkey", "p_partkey")
        .groupBy("p_size")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("pruned_revenue"),
        )
    )


J8_ORACLE = f"""
SELECT p.p_size,
       COUNT(*) AS n_lineitems,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS pruned_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size IN {J8_SIZES}
GROUP BY p.p_size
"""

# --- registration ---------------------------------------------------------

register(QuerySpec("approx_distinct_bound", approx_distinct_bound,
                   APPROX_DISTINCT_ORACLE, tags=("HLL",)))
register(QuerySpec("approx_quantile_bound", approx_quantile_bound,
                   APPROX_QUANTILE_ORACLE, tags=("TDIGEST",)))
register(QuerySpec("dq1_lineitem_rules", dq1_lineitem_rules, DQ1_ORACLE,
                   tags=("DQ1",)))
register(QuerySpec("j8_bloom_pruned_join", j8_bloom_pruned_join, J8_ORACLE,
                   tags=("J8",)))


# --- J9: salted skew-join equivalence --------------------------------------


def j9_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit-salting skew join (``operators/skew.py``) on real
    fixture tables, differentially proven equal to the plain join: the
    salt must change the SHUFFLE LAYOUT only, never the result.  Both
    sides here are modest, but the operator is the one you reach for
    when both sides are too big to broadcast AND keys are hot (the
    'default user' pattern); rollup keeps the compared output small."""
    from star_schema_etl_airflow_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = salted_join(li, orders, on="l_orderkey", n_salts=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("l_quantity").alias("sum_qty"),
    )


J9_ORACLE = """
SELECT o.o_orderstatus,
       COUNT(*) AS n_lines,
       SUM(l.l_quantity) AS sum_qty
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""

register(QuerySpec("j9_salted_join", j9_salted_join, J9_ORACLE,
                   tags=("J1", "skew")))


# --- DQ2: documents-corpus expectation suite --------------------------------

# The LLM-corpus twin of DQ1: the expectations a training-data release
# validates before anything downstream trusts the columns the pipeline
# keys on (n_chars drives packing/curriculum; lang drives mixing/
# stratification; doc_id drives every join).
_DQ2_LANGS = ("en", "es", "de", "fr", "zh")


def _document_rules() -> list:
    from star_schema_etl_airflow_spark.operators.quality import (
        Rule,
        in_set,
        not_null,
    )

    return [
        Rule("doc_id_not_null", not_null("doc_id")),
        Rule("text_not_null", not_null("text")),
        Rule("text_nonempty", F.length("text") > 0),
        # the metadata column the packing/curriculum operators key on
        # must agree with the payload it summarizes
        Rule("n_chars_consistent", F.col("n_chars") == F.length("text")),
        Rule("lang_known", in_set("lang", list(_DQ2_LANGS))),
        Rule("source_not_null", not_null("source")),
    ]


def dq2_document_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation census over the documents corpus — one scan, one row
    per rule (``operators/quality.py::check``); the release gate a
    corpus passes before packing/mixing/curriculum trust its columns."""
    from star_schema_etl_airflow_spark.operators.quality import check

    return check(load_table(spark, sf_dir, "documents"), _document_rules())


_DQ2_CASES = {
    "doc_id_not_null": "doc_id IS NOT NULL",
    "text_not_null": "text IS NOT NULL",
    "text_nonempty": "LENGTH(text) > 0",
    "n_chars_consistent": "n_chars = LENGTH(text)",
    "lang_known": "lang IN ('en', 'es', 'de', 'fr', 'zh')",
    "source_not_null": "source IS NOT NULL",
}

DQ2_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS rule,
       CAST(COALESCE(SUM(CASE WHEN NOT ({good}) THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS violations,
       CAST(COUNT(*) AS BIGINT) AS total_rows
FROM documents"""
    for name, good in _DQ2_CASES.items()
)

register(QuerySpec("dq2_document_rules", dq2_document_rules, DQ2_ORACLE,
                   tags=("GOVERNANCE", "DQ")))
