"""MERGE upsert as a pure-DataFrame read-modify-write (operator S7/J6).

The reference's fact MERGE (sql/core/fact/fact_orders.sql:6-105) is
"WHEN MATCHED THEN UPDATE everything, WHEN NOT MATCHED THEN INSERT" on a
composite key — equivalently: keep target rows whose key has no source
match, and take every source row.  On plain Parquet (no Delta in this
environment, SURVEY.md §7.4 decision 1) that is an anti-join + union,
rewritten atomically by the partitioned writers in ``sources.io``.

Scale design: the anti-join shuffles on the merge key — the same key the
fact table is naturally bucketed/partitioned by, so with bucketing both
sides co-locate and the shuffle disappears.  When the daily source slice is
small relative to the target, only the touched date partitions need the
read-modify-write (pair with ``write_partition_overwrite``), so the rewrite
cost is O(day), not O(history).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys`` (source wins on match).

    Both inputs must share a schema; one row per key in ``source`` is the
    caller's contract (dedupe first — see ``scd2.dedupe_latest``).
    """
    keys = list(keys)
    untouched = target.join(source.select(keys).distinct(), on=keys, how="left_anti")
    return untouched.unionByName(source.select(target.columns))


def delta_available() -> bool:
    """True when the delta-spark package (and its JVM jars) is importable."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def merge_upsert_delta(
    spark,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
) -> None:
    """The 1:1 Delta Lake backend for the reference MERGE
    (sql/core/fact/fact_orders.sql:6-105 and dim upserts,
    sql/core/dim/dim_customers.sql:12-80):
    ``DeltaTable.merge().whenMatchedUpdateAll().whenNotMatchedInsertAll()``
    on the composite key — identical semantics to :func:`merge_upsert`
    (differential equivalence pinned in ``tests/test_merge_delta.py``,
    skipped where delta-spark is absent), but executed as an in-place
    transactional MERGE instead of a read-modify-write swap.

    Scale notes: Delta's MERGE rewrites only the files containing matched
    keys (file-level skipping via min/max stats), so a daily slice against
    a 100 TB fact touches O(day) files; pair with table partitioning on
    the date column exactly like the parquet path.
    """
    from delta.tables import DeltaTable

    keys = list(keys)
    tgt = DeltaTable.forPath(spark, target_path)
    # plain equality, not <=>: mirrors merge_upsert's equi-join (NULL keys
    # never match — a NULL-keyed source row inserts rather than updates)
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
    (
        tgt.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
