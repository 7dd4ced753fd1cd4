"""File-level min/max skipping (operators/skipping.py): pruning must be
sound (never drops a qualifying row) on multi-file layouts, and the
pruned read must equal the full-scan filter bit-for-bit."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.skipping import (
    build_manifest,
    prune_files,
    pruned_read,
)


@pytest.fixture(scope="module")
def dated_table(spark, tmp_path_factory):
    """A parquet table range-clustered into several files by date."""
    path = str(tmp_path_factory.mktemp("skip") / "t.parquet")
    df = spark.range(0, 1000).select(
        F.col("id"),
        F.date_add(F.lit(datetime.date(2024, 1, 1)), F.col("id").cast("int") % 200)
        .alias("d"),
        (F.col("id") * 7 % 100).alias("v"),
    )
    df.repartitionByRange(8, "d").write.mode("overwrite").parquet(path)
    return path


def test_manifest_covers_every_file_and_prunes(spark, dated_table):
    man = build_manifest(spark, dated_table, "d")
    assert len(man) == 8
    lo, hi = datetime.date(2024, 1, 10), datetime.date(2024, 1, 30)
    kept = prune_files(man, lo, hi)
    # range-clustered layout → a 21-day window must not need all 8 files
    assert 0 < len(kept) < 8


def test_pruned_read_equals_full_filter(spark, dated_table):
    lo, hi = datetime.date(2024, 1, 10), datetime.date(2024, 1, 30)
    pruned = pruned_read(spark, dated_table, "d", lo, hi)
    full = (
        spark.read.parquet(dated_table)
        .filter(F.col("d").between(F.lit(lo), F.lit(hi)))
    )
    assert sorted(pruned.collect()) == sorted(full.collect())
    assert pruned.schema == full.schema


def test_all_pruned_returns_empty_with_schema(spark, dated_table):
    lo, hi = datetime.date(1990, 1, 1), datetime.date(1990, 12, 31)
    out = pruned_read(spark, dated_table, "d", lo, hi)
    assert out.count() == 0
    assert out.schema == spark.read.parquet(dated_table).schema


def test_null_only_file_skipped_mixed_file_kept(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skipnull") / "t.parquet")
    nulls = spark.range(0, 10).select(
        F.col("id"), F.lit(None).cast("date").alias("d")
    )
    mixed = spark.range(10, 20).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(datetime.date(2024, 6, 1)))
        .otherwise(F.lit(None)).alias("d"),
    )
    nulls.coalesce(1).write.mode("overwrite").parquet(path)
    mixed.coalesce(1).write.mode("append").parquet(path)
    man = build_manifest(spark, path, "d")
    assert len(man) == 2
    kept = prune_files(
        man, datetime.date(2024, 1, 1), datetime.date(2024, 12, 31)
    )
    assert len(kept) == 1  # the all-null file cannot match a range predicate
    out = pruned_read(
        spark, path, "d", datetime.date(2024, 1, 1), datetime.date(2024, 12, 31)
    )
    assert [r["id"] for r in out.orderBy("id").collect()] == [10, 12, 14, 16, 18]


def test_pruned_read_monetizes_zorder_layout(spark, tmp_path):
    """The zone-map operator and the z-order writer compose: a band
    predicate on EITHER clustered dimension skips files through
    build_manifest/prune_files, and the pruned read stays exact."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.sources import io as sio

    out = str(tmp_path / "zorder")
    n, files = 64, 16
    grid = spark.range(0, n * n).selectExpr(
        f"id % {n} as x", f"id div {n} as y"
    )
    sio.write_zorder(grid, out, "x", "y", bits=8, n_files=files)
    for col in ("x", "y"):
        man = build_manifest(spark, out, col)
        assert len(man) == files
        kept = prune_files(man, 5, 10)
        assert len(kept) < files  # the clustered layout actually prunes
        pruned = pruned_read(spark, out, col, 5, 10)
        full = spark.read.parquet(out).filter(F.col(col).between(5, 10))
        assert sorted(pruned.collect()) == sorted(full.collect())
