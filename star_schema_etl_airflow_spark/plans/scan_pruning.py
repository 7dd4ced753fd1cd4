"""Oracle-checked query over the file-skipping operator
(``operators/skipping.py``): a date-range revenue rollup whose scan goes
through min/max manifest pruning instead of a plain full-table read.

The differential contract is exactly the operator's soundness claim:
manifest pruning + residual filter ≡ full scan + filter, on any file
layout.  At the fixture (one file per table) pruning is degenerate but
the whole path — manifest build, interval intersection, schema-pinned
multi-file read, residual predicate — is executed; the multi-file and
all-pruned layouts are pinned by ``tests/test_skipping.py``.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.skipping import pruned_read
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import table_path

SKIP_LO = datetime.date(1995, 1, 1)
SKIP_HI = datetime.date(1995, 12, 31)


def skip_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1995 monthly revenue off a manifest-pruned lineitem scan."""
    li = pruned_read(
        spark, table_path(sf_dir, "lineitem"), "l_shipdate", SKIP_LO, SKIP_HI
    )
    return (
        li.groupBy(
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
        .agg(
            # decimal-exact revenue (the _rev_s recipe, plans/tpch_queries.py)
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(2,0)")
                    - F.col("l_discount").cast("decimal(6,4)")
                )
            )
            .cast("decimal(32,6)")
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


SKIP_ORACLE = f"""
SELECT EXTRACT(YEAR FROM l_shipdate) AS ship_year,
       EXTRACT(MONTH FROM l_shipdate) AS ship_month,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(6,4))))
                 AS DECIMAL(32,6)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate BETWEEN DATE '{SKIP_LO}' AND DATE '{SKIP_HI}'
GROUP BY 1, 2
"""

register(QuerySpec("skip_pruned_scan", skip_pruned_scan, SKIP_ORACLE,
                   tags=("SKIPPING", "P2")))
