"""Snapshot diff: row-level change classification between two versions of
a table — the CDC/audit primitive (what changed between yesterday's and
today's extract; did a pipeline refactor alter any output rows).

The reference implies this comparison inside its SCD2 MERGE scripts; here
it is a standalone operator because at scale it is how you (a) build a
change feed from full extracts when the source has no CDC, and (b)
regression-test a pipeline change by diffing old/new outputs exactly.

Scale design: one full-outer equi-join on the key (shuffle both sides on
the key, or broadcast when one snapshot is small — AQE decides); the
change predicate is column-wise null-safe comparison evaluated inside the
join projection.  Output is usually consumed filtered to
``change_type <> 'unchanged'`` — predicate pushdown prunes on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_ADDED = "added"
CHANGE_REMOVED = "removed"
CHANGE_CHANGED = "changed"
CHANGE_UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    tracked: list[str] | None = None,
) -> DataFrame:
    """``(keys..., change_type)`` per business key across both snapshots.

    ``tracked`` defaults to every non-key column of ``new``; comparison is
    null-safe (NULL→value and value→NULL count as changes, the SCD2 rule).
    """
    tracked = tracked or [c for c in new.columns if c not in keys]
    o = old.withColumn("__in_old", F.lit(1)).alias("o")
    n = new.withColumn("__in_new", F.lit(1)).alias("n")
    cond = None
    for k in keys:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else (cond & c)
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    return o.join(n, cond, "full_outer").select(
        *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys],
        F.when(F.col("o.__in_old").isNull(), CHANGE_ADDED)
        .when(F.col("n.__in_new").isNull(), CHANGE_REMOVED)
        .when(differs, CHANGE_CHANGED)
        .otherwise(CHANGE_UNCHANGED)
        .alias("change_type"),
    )
