"""SparkSession factory with scale-appropriate defaults.

The reference delegates execution to BigQuery; here Spark is the engine, so
session-level configuration is where the workload-level optimizations the
reference encodes manually (partition pruning, incremental refresh — see
SURVEY.md §4) become automatic:

- UTC session timezone (BigQuery ``DATE(timestamp)`` is UTC; pins semantics)
- AQE on (runtime join-strategy selection, skew-join splitting, partition
  coalescing) — the 100 TB story relies on this
- dynamic partition overwrite (idempotent per-date partition refresh, the
  Spark equivalent of the reference's DELETE-then-INSERT datamart pattern,
  ``sql/datamart/sales/sales_summary.sql:6-7``)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "star-schema-etl-spark",
              master: str | None = None,
              shuffle_partitions: str | int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_SHUFFLE_PARTITIONS}]")

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        # Arrow for the Pandas-UDF extension operators (similarity, multimodal)
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # keep driver results bounded; operators never collect big data anyway
        "spark.driver.maxResultSize": "2g",
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
