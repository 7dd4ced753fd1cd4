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


def ivm_join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on,
) -> DataFrame:
    """Delta of an inner-join view under inserts on BOTH sides:

        Δ(A ⋈ B) = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    the classic counting-free join-IVM identity for insert-only deltas
    (each new pair contains a new row from at least one side, counted
    exactly once by conditioning the other side on old/new).  The new
    view is ``V_old ∪ ivm_join_delta(...)`` — no rescan of V_old.

    Scale design: deltas are batch-sized, so the two cross terms
    broadcast the delta side against the big old side — the ONLY
    big-table scans are one pass each of A_old and B_old, vs the full
    A ⋈ B recompute; ΔA ⋈ ΔB is delta×delta (tiny).  With the base
    tables bucketed on the join key the old-side scans co-locate too.
    Delete/update deltas need counting IVM (multiplicity column) — out
    of scope here, documented rather than faked.
    """
    return (
        F.broadcast(a_delta).join(b_old, on)
        .unionByName(a_old.join(F.broadcast(b_delta), on))
        .unionByName(a_delta.join(b_delta, on))
    )


def ivm_counting_state(df: DataFrame, keys: list[str], val_col: str,
                       mult: int) -> DataFrame:
    """Counting-IVM partial state for one batch: per-group multiplicity
    and multiplicity-signed value sum.  ``mult`` is +1 for insert
    batches, -1 for delete batches (a deleted row must exist in the
    maintained multiset — the caller's referential contract)."""
    return df.groupBy(*keys).agg(
        (F.count(F.lit(1)) * mult).alias("mult"),
        (F.sum(F.col(val_col).cast("decimal(18,2)")) * mult).alias("vsum"),
    )


def ivm_counting_merge(*states: DataFrame) -> DataFrame:
    """Merge counting-IVM states by addition, dropping groups whose net
    multiplicity reaches zero — the counting algebra that makes DELETE
    deltas maintainable (plain additive IVM handles inserts only).

    SUM/COUNT maintain under deletes this way; MIN/MAX do NOT (a deleted
    extremum needs a per-group value index to re-derive) — documented
    limit, same as every counting-IVM system.  Scale: each merge is one
    hash aggregate over state ∪ delta (state-sized, map-side combined);
    zero-multiplicity groups are physically dropped so state never
    accretes tombstones."""
    keys = [c for c in states[0].columns if c not in ("mult", "vsum")]
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return (
        merged.groupBy(*keys)
        .agg(F.sum("mult").alias("mult"), F.sum("vsum").alias("vsum"))
        .filter(F.col("mult") != 0)
    )
