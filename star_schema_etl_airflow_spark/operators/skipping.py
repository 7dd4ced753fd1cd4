"""File-level data skipping: min/max manifest pruning beneath the
partition grain.

Directory partitioning (``sources/io.py``) prunes whole date partitions;
this operator prunes *files inside* a partition (or an unpartitioned
table) by their per-file column ranges — the zone-map / Delta-stats
technique.  At 100 TB a table is O(1e5-1e6) parquet files; a predicate
on a clustered column (timestamps and monotonically-assigned ids are
naturally clustered by arrival) typically touches a few percent of them,
and skipping the rest saves the scheduler, the scan, and the filter work
Spark would otherwise spend discovering emptiness.

Production shape: the manifest is *persisted* — written once per ingest
(the writer already has the stats in the parquet footers) and stored as
a tiny table keyed by file path; pruning is then a metadata-only lookup.
``build_manifest`` here computes it with one narrow scan (projecting
only the pruning columns, so the footprint is columnar-minimal) because
the fixture layout carries no sidecar; ``pruned_read`` is unchanged
either way.

Correctness contract: pruning is *sound, not exact* — file ranges
over-approximate, so the residual predicate is always re-applied after
the pruned read.  The result is bit-identical to the full-scan filter
under any file layout (proven differentially by ``skip_pruned_scan``
and structurally by ``tests/test_skipping.py``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FileRange:
    path: str
    lo: object
    hi: object
    has_null: bool


def build_manifest(
    spark: SparkSession, path: str, column: str
) -> list[FileRange]:
    """One ``FileRange`` per parquet file: min/max of ``column`` plus a
    null marker.  The scan projects only ``column`` (columnar-minimal);
    the collect is control-plane sized — one row per file, the same
    class as the watermark/max-sk reads elsewhere in the repo."""
    stats = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), F.col(column).alias("c"))
        .groupBy("f")
        .agg(
            F.min("c").alias("lo"),
            F.max("c").alias("hi"),
            F.max(F.col("c").isNull().cast("int")).alias("has_null"),
        )
        .collect()
    )
    return [
        FileRange(r["f"], r["lo"], r["hi"], bool(r["has_null"]))
        for r in stats
    ]


def _coerce_bound(bound: object, sample: object) -> object:
    """Match SQL's date→timestamp cast (midnight) whenever one side of a
    comparison is a timestamp and the other a plain date — symmetric, so
    both (date bound vs timestamp stats) and (timestamp bound vs date
    stats) compare as timestamps instead of raising TypeError."""
    import datetime

    if (
        isinstance(sample, datetime.datetime)
        and isinstance(bound, datetime.date)
        and not isinstance(bound, datetime.datetime)
    ):
        return datetime.datetime.combine(bound, datetime.time.min)
    return bound


def prune_files(
    manifest: list[FileRange], lo: object, hi: object
) -> list[str]:
    """Paths whose [lo, hi] range may intersect the closed predicate
    interval.  A file of only-null values (lo is None) cannot satisfy a
    range predicate and is skipped; files with mixed nulls survive on
    their non-null range."""
    keep = []
    for fr in manifest:
        if fr.lo is None and fr.hi is None:
            continue
        # Promote BOTH directions: date bounds up to the stats' timestamp
        # type, and date stats up to the bounds' timestamp type.
        flo, fhi = _coerce_bound(lo, fr.lo), _coerce_bound(hi, fr.hi)
        frlo, frhi = _coerce_bound(fr.lo, lo), _coerce_bound(fr.hi, hi)
        if frhi < flo or frlo > fhi:
            continue
        keep.append(fr.path)
    return keep


def pruned_read(
    spark: SparkSession,
    path: str,
    column: str,
    lo: object,
    hi: object,
    manifest: list[FileRange] | None = None,
) -> DataFrame:
    """Read only the files that can contain ``column BETWEEN lo AND hi``,
    then re-apply the exact predicate (pruning is an over-approximation;
    the residual filter restores exactness).  Returns an empty DataFrame
    with the table's schema when every file is pruned."""
    manifest = manifest if manifest is not None else build_manifest(
        spark, path, column
    )
    files = prune_files(manifest, lo, hi)
    full_schema = spark.read.parquet(path).schema
    if not files:
        return spark.createDataFrame([], full_schema)
    return (
        spark.read.schema(full_schema)
        .parquet(*files)
        .filter(F.col(column).between(F.lit(lo), F.lit(hi)))
    )
