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


# Resolved-table cache — the loader is this engine's de-facto catalog, and
# like a catalog's table-resolution cache it avoids re-paying file listing,
# footer schema inference, and plan-construction round trips on every query
# that touches the same table (measured 0.3-0.9 s of pure driver-side build
# time per headline query without it).  Keyed by session (a stopped
# session's DataFrames are unusable) and the path's mtime_ns (Spark writers
# commit via rename, so any rewrite bumps it and invalidates the entry).
_RESOLVED: dict[tuple, DataFrame] = {}


def clear_table_cache() -> None:
    _RESOLVED.clear()


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
    path = table_path(sf_dir, name)
    if name == "events":
        # runtime confs must be in place even on a cache hit: the nanos
        # rewrite is read at scan execution, not at plan build
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the epoch→timestamp conversion renders in the session tz; the
        # fixture's ns values are naive UTC, so pin UTC even when the
        # caller's session didn't (both are runtime confs)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        key = (
            spark.sparkContext.applicationId,
            os.path.realpath(path),
            os.stat(path).st_mtime_ns,
        )
    except OSError:
        key = None  # path missing/unstat-able: let spark.read raise
    if key is not None and key in _RESOLVED:
        return _RESOLVED[key]
    df = spark.read.parquet(path)
    if name == "events":
        from pyspark.sql import functions as F

        # Only the driver fixture needs the nanos-long → micros rewrite;
        # events written by our own writers already carry a timestamp ts.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if key is not None:
        _RESOLVED[key] = df
    return df


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# scan-partition counts, probed once per resolved table (plan-only; no job)
_SCAN_PARTS: dict[tuple, int] = {}


def spread_scan(df: DataFrame, key: str, *cols: str) -> DataFrame:
    """Hash-repartition a narrow projection of a scan across the local
    cores when the source supplies fewer input splits than cores.

    Why (r16, guide §2.5 input skew / §1.2 step 1): the fixture tables
    are single-row-group parquet files, so Spark's scan yields ONE task
    per table regardless of ``maxPartitionBytes`` — every map-side
    pipeline fused above such a scan (broadcast-join probes, partial
    aggregation, heavy projections) inherits that 1-core cap.  A hash
    repartition on a real key spreads the narrow projection (project
    FIRST so the exchange carries only needed columns, guide §2.3) and
    is deterministic under retries (unlike round-robin, no
    sort-before-repartition pass either).

    Scale behavior: the repartition is applied ONLY when the scan's
    split count is below the session's core count — at production scale
    input arrives in ≥ cores splits and this helper is an exact no-op
    (no exchange in the plan).  Consumers must be partitioning-agnostic
    (every oracle-checked query is: exact-decimal/int aggregates,
    equi-joins, windows with full ORDER BY tie-breaks).
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    out = df.select(*cols) if cols else df
    try:
        k = (
            spark.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
        parts = _SCAN_PARTS.get(k)
        if parts is None:
            parts = df.rdd.getNumPartitions()
            _SCAN_PARTS[k] = parts
    except Exception:  # pragma: no cover — Connect: split count unknown.
        # Fail CLOSED (no spread): injecting a repartition here would add
        # a full exchange of every fact-table projection on production-
        # split inputs, contradicting the no-op-at-scale contract above
        # (r16 verdict item 2).  The spread is a local-mode fixture aid;
        # when the probe is unavailable, the bare projection is correct.
        return out
    if parts >= n:
        return out
    return out.repartition(n, key)
