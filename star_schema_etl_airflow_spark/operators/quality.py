"""Declarative data-quality validation — the Spark-side equivalent of the
reference's load-quality knobs (``max_bad_records=0``,
``ignore_unknown_values=False``, ``allow_jagged_rows=False`` —
utils/operators.py:27-30): the reference rejects bad rows at load time;
this operator *measures and gates* rule violations on any DataFrame, at any
pipeline stage, in one distributed pass.

Design: each rule is a boolean Column ("the row is GOOD"); ``check`` builds
a single ``agg`` of ``SUM(CASE WHEN NOT good THEN 1 END)`` per rule plus a
total row count, then unpivots to one row per rule.  One job, one pass over
the data, no shuffle (aggregation is a global partial+final over counts) —
at 100 TB this costs a single scan regardless of the number of rules.

``enforce`` raises when any rule exceeds its allowed violation count
(default 0 — exactly the reference's ``max_bad_records=0`` disposition).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    good: Column  # True ⇒ the row passes
    max_violations: int = 0


class QualityError(RuntimeError):
    """Raised by :func:`enforce` when a rule exceeds its violation budget."""


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row per rule: ``rule, violations, total_rows`` (single pass)."""
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(F.when(~r.good, F.lit(1)).otherwise(F.lit(0))).alias(f"__v_{i}")
        for i, r in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    # unpivot via stack: n rules → n rows, all from the single agg row
    pairs = ", ".join(
        f"'{r.name}', __v_{i}" for i, r in enumerate(rules)
    )
    return wide.selectExpr(
        f"stack({len(rules)}, {pairs}) as (rule, violations)", "__total as total_rows"
    ).select(
        "rule",
        F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias("violations"),
        F.col("total_rows").cast("long"),
    )


def enforce(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Return ``df`` unchanged if every rule is within budget, else raise.

    The check is a separate aggregate job over ``df`` — the data itself is
    not re-written or filtered (matching the reference's all-or-nothing
    load disposition rather than a quarantine flow).
    """
    budget = {r.name: r.max_violations for r in rules}
    bad = [
        (row["rule"], row["violations"])
        for row in check(df, rules).collect()
        if row["violations"] > budget[row["rule"]]
    ]
    if bad:
        detail = ", ".join(f"{name}: {n} violation(s)" for name, n in bad)
        raise QualityError(f"quality gate failed — {detail}")
    return df


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    return F.col(col).between(lo, hi)


def in_set(col: str, values: list) -> Column:
    return F.col(col).isin(values)


def unique_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Duplicate-key report: one row per duplicated key with its count.

    Unlike the row-local rules above this needs a shuffle on the key — it's
    the distributed replacement for a uniqueness constraint.
    """
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
