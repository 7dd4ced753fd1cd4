"""Table profiling: per-column null counts, exact distinct counts, and
min/max — the ANALYZE/data-profiling step a curation pipeline runs before
trusting a new drop of data (complements the rule gate in
``operators/quality.py``, which *asserts*; this *measures*).

Spark-first shape: ONE aggregate computes every column's stats in a
single scan (multiple exact COUNT DISTINCTs become one Expand — each row
is replicated once per profiled column, the standard multi-distinct
plan), then a ``stack`` unpivots the single stats row into long format.
At 100 TB the scan dominates and profiling N columns costs one pass plus
an N-way expand of the shuffle — swap ``approx_count_distinct`` in where
exact NDV isn't needed (the plan then collapses to plain partial aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, ndv, min_num, max_num, min_str, max_str);
    the min/max slot not matching the column's type family is NULL."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols + string_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
        ]
    for c in numeric_cols:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    for c in string_cols:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
    stats = df.agg(*aggs)

    parts = []
    for c in numeric_cols:
        parts.append(
            f"'{c}', `{c}__nulls`, `{c}__ndv`, `{c}__min`, `{c}__max`, "
            f"cast(null as string), cast(null as string)"
        )
    for c in string_cols:
        parts.append(
            f"'{c}', `{c}__nulls`, `{c}__ndv`, cast(null as double), "
            f"cast(null as double), `{c}__min`, `{c}__max`"
        )
    n = len(parts)
    return stats.select(
        F.expr(
            f"stack({n}, {', '.join(parts)}) as "
            "(column, n_nulls, ndv, min_num, max_num, min_str, max_str)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_nulls", "ndv",
        "min_num", "max_num", "min_str", "max_str",
    )
