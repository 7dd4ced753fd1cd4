"""Differential equivalence of the Delta Lake MERGE backend vs the
pure-DataFrame ``merge_upsert`` on the same fixture — the optional 1:1
backend for the reference MERGE (sql/core/dim/dim_customers.sql:12-80).

Skipped wholesale where delta-spark is not installed (this sandbox);
the backend is import-guarded the same way.
"""

from __future__ import annotations

import pytest

from star_schema_etl_airflow_spark.operators.merge import (
    delta_available,
    merge_upsert,
    merge_upsert_delta,
)

pytestmark = pytest.mark.skipif(
    not delta_available(),
    reason=(
        "delta-spark not installable in this sandbox (audited r10: "
        "no pip installs permitted AND no network for ivy/maven jar "
        "resolution — both `import delta` and a maven reachability "
        "probe fail).  The pure-DataFrame merge_upsert path is the "
        "oracle-checked core; this backend runs 1:1 wherever "
        "delta-spark is present.  See FIXTURES.md §environment."
    ),
)


@pytest.fixture(scope="module")
def delta_spark():
    """Separate session with the Delta SQL extensions enabled."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-merge-tests")
        .config("spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension")
        .config("spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
    )
    s = configure_spark_with_delta_pip(builder).getOrCreate()
    yield s
    s.stop()


def test_delta_merge_matches_dataframe_merge(delta_spark, tmp_path):
    spark = delta_spark
    target = spark.createDataFrame(
        [(1, "2024-01-01", "a", 10.0),
         (2, "2024-01-01", "b", 20.0),
         (3, "2024-01-02", "c", 30.0)],
        "order_id long, order_date string, status string, amount double",
    )
    source = spark.createDataFrame(
        [(2, "2024-01-01", "b2", 25.0),   # matched → update
         (4, "2024-01-02", "d", 40.0)],   # not matched → insert
        "order_id long, order_date string, status string, amount double",
    )
    keys = ["order_id", "order_date"]

    expected = sorted(
        map(tuple, merge_upsert(target, source, keys).collect())
    )

    path = str(tmp_path / "delta_target")
    target.write.format("delta").save(path)
    merge_upsert_delta(spark, path, source, keys)
    got = sorted(
        map(tuple, spark.read.format("delta").load(path).collect())
    )
    assert got == expected
