"""Loaders for the driver test fixtures (TPC-H-ish star schema).

``/root/testdata/sf*/`` holds: region nation customer supplier part orders
lineitem events documents embeddings (TESTDATA.md).  These are the inputs for
every oracle-checked query; the reference's sales domain transposes onto them
per FIXTURES.md §B (orders/lineitem ≈ raw orders/order_items, part ≈
products, customer ≈ customers).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/projections into it.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as nanos-since-epoch long
    (``spark.sql.legacy.parquet.nanosAsLong``, a runtime conf) and surface
    it as a microsecond TimestampType so downstream code sees a normal
    timestamp column (DuckDB oracles cast their TIMESTAMP_NS the same way).
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the epoch→timestamp conversion below renders in the session tz;
        # the fixture's ns values are naive UTC, so pin UTC even when the
        # caller's session didn't (both are runtime confs)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(table_path(sf_dir, name))
        # Only the driver fixture needs the nanos-long → micros rewrite;
        # events written by our own writers already carry a timestamp ts.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
