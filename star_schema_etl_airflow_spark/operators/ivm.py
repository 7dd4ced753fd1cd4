"""Incremental view maintenance (IVM) for additive aggregates — the
100 TB answer to "rebuild the datamart nightly": fold each day's delta
into a persisted partial-aggregate state instead of re-scanning history.

The reference rebuilds ``sales_summary`` per date by DELETE+INSERT over
that date's slice (``sql/datamart/sales/sales_summary.sql:6-7``), which
is already incremental across *dates*.  This operator generalizes it to
the within-group case: deltas that touch EXISTING groups (late lines for
an already-seen order, same-day multi-batch loads) merge associatively
instead of forcing a group recompute.

Mergeability algebra (why the state is a *grain* table):
- SUM / COUNT merge by addition, MIN / MAX by min/max — re-aggregating
  unioned partials is exact.
- AVG is not mergeable directly — derive it from (SUM, COUNT) at read.
- COUNT(DISTINCT k) is not mergeable from per-group scalars at all; the
  state keeps one row per (group, k) (the "grain"), where the distinct
  count degenerates to COUNT(*) — mergeable again.  This is the same
  pre-aggregate-to-grain rewrite documented in ``plans/datamart.py``.

Scale design: the merge unions state with the (small) delta partials and
re-aggregates on the grain key — Catalyst plans it as one hash aggregate
with map-side combine; with the state date-partitioned, dynamic
partition overwrite rewrites only the dates present in the delta (the
unchanged 99.9% of a 100 TB state is never read or written).  Decimal
sums keep the fold order-independent, so incremental == full recompute
bit-for-bit, which is exactly what the differential oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAIN_KEYS = ["sale_date", "product_category", "l_orderkey"]


def sales_grain_partials(
    lineitem: DataFrame, orders: DataFrame, part: DataFrame
) -> DataFrame:
    """Partial-aggregate grain rows for a batch of raw lines:
    one row per (sale_date, category, order) carrying mergeable sums."""
    enriched = (
        lineitem
        .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"])
    )
    return (
        enriched.groupBy(
            F.to_date("o_orderdate").alias("sale_date"),
            F.col("p_type").alias("product_category"),
            "l_orderkey",
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("sum_sales"),
            # decimal like sum_sales: a plain double SUM folded in two
            # levels (partial → merge → summary) differs from a flat SUM
            # in ULPs once quantities are fractional, breaking the
            # incremental == full-recompute bit-for-bit contract.
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def merge_grain(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Associative merge: union partials, re-aggregate on the grain key.
    Exact for SUM/COUNT by the algebra above; idempotence is the
    caller's contract (feed each batch once — the audit/HWM loaders in
    ``sources/incremental.py`` provide exactly-once batch boundaries)."""
    return (
        state.unionByName(delta)
        .groupBy(*GRAIN_KEYS)
        .agg(
            F.sum("sum_sales").alias("sum_sales"),
            F.sum("sum_qty").alias("sum_qty"),
            F.sum("n_lines").alias("n_lines"),
        )
    )


def grain_to_summary(grain: DataFrame) -> DataFrame:
    """Read-side rollup of the grain state to the published datamart
    shape; COUNT(*) over grain rows IS the distinct order count."""
    return (
        grain.groupBy("sale_date", "product_category")
        .agg(
            F.sum("sum_sales").cast("decimal(38,2)").cast("double")
            .alias("total_sales"),
            F.count(F.lit(1)).alias("total_orders"),
            F.sum("sum_qty").cast("decimal(38,2)").cast("double")
            .alias("total_quantity"),
        )
    )
