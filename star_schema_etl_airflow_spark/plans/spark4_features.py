"""Spark 4 surface census: VARIANT semi-structured access and the
ANSI-safe ``try_*`` function family, both oracle-checked.

VARIANT is Spark 4's typed semi-structured column (binary-encoded JSON
with typed path extraction) — the engine-native replacement for
string-JSON + ``get_json_object``.  The census pins the extraction
semantics (typed get, missing-path null, null-detection) against
DuckDB's JSON operators, which share the same logical results.

The ``try_`` family is the ANSI-mode-safe arithmetic/cast surface:
errors become NULLs instead of job failures — at 100 TB a single
malformed row must never kill a stage, so every production expression
that can throw (division, overflow, cast, array index) has a ``try_``
twin; this census pins each one cross-engine.

Reference parity: beyond-reference (the reference's only null-safety
device is SAFE_DIVIDE, §2.8 — covered as A6/`safe_divide`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table


def fn_variant_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed VARIANT path extraction over the events ``props`` JSON:
    int and double gets of an existing path, null for a missing path
    (``try_variant_get``), and variant-null detection.  All map-side
    expression work inside whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "props")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "double").alias("k_double"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_int"),
        F.is_variant_null(v).alias("is_top_null"),
    )


FN_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
       CAST(json_extract(props, '$.k') AS DOUBLE) AS k_double,
       CAST(NULL AS INTEGER) AS missing_int,
       FALSE AS is_top_null
FROM events
"""


def fn_try_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_`` error-to-null family over lineitem: division by a
    data-dependent zero, bigint-overflow addition, bad string casts,
    numeric parsing, and out-of-bounds array access."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 100
    )
    zero_when_f = F.col("l_linenumber") - F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), zero_when_f).alias(
            "div_by_zero"
        ),
        F.try_add(F.lit(9223372036854775807), F.col("l_orderkey")).alias(
            "overflow_add"
        ),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.concat(F.lit("1"), F.col("l_linenumber").cast("string"))
        .try_cast("int")
        .alias("parsed_int"),
        F.try_element_at(
            F.array(F.col("l_quantity")), F.lit(5)
        ).alias("oob_element"),
    )


FN_TRY_ORACLE = """
SELECT l_orderkey,
       l_linenumber,
       CAST(NULL AS DOUBLE) AS div_by_zero,
       CASE WHEN l_orderkey > 0 THEN CAST(NULL AS BIGINT)
            ELSE 9223372036854775807 + l_orderkey END AS overflow_add,
       TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
       TRY_CAST('1' || CAST(l_linenumber AS VARCHAR) AS INTEGER)
         AS parsed_int,
       CAST(NULL AS DOUBLE) AS oob_element
FROM lineitem
WHERE l_orderkey < 100
"""

register(QuerySpec("fn_variant_census", fn_variant_census, FN_VARIANT_ORACLE,
                   tags=("VARIANT", "§2.8")))
register(QuerySpec("fn_try_census", fn_try_census, FN_TRY_ORACLE,
                   tags=("TRY", "§2.8")))


# --- custom Python DataSource, value-hash checked ---------------------------

PYDS_ROWS = 2000
PYDS_PARTS = 8


def pyds_synthetic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python DataSource (sources/pyds.py) and
    aggregate per event type — the connector's partition fan-out,
    schema declaration, and row generation are all under the value-hash
    check because the md5-derived generator is re-derivable in SQL."""
    from star_schema_etl_airflow_spark.sources.pyds import (
        register_synthetic_events,
    )

    register_synthetic_events(spark)
    ev = (
        spark.read.format("synthetic_events")
        .option("rows", PYDS_ROWS)
        .option("partitions", PYDS_PARTS)
        .load()
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "total_value"
        ),
        F.countDistinct("user_id").alias("n_users"),
    )


PYDS_ORACLE = f"""
WITH ids AS (SELECT unnest(range(0, {PYDS_ROWS})) AS event_id),
h AS (
  SELECT event_id,
         CAST(('0x' || substr(md5('evt:' || CAST(event_id AS VARCHAR)),
                              1, 15)) AS BIGINT) AS hv
  FROM ids
),
ev AS (
  SELECT event_id,
         hv % 1000 AS user_id,
         (['view', 'click', 'purchase'])[hv % 3 + 1] AS event_type,
         CAST(hv % 10000 AS DOUBLE) / 100.0 AS value
  FROM h
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM ev
GROUP BY 1
"""

register(QuerySpec("pyds_synthetic_events", pyds_synthetic_events,
                   PYDS_ORACLE, tags=("PYDS", "S1")))
