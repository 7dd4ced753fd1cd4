"""Join pruning via Catalyst runtime (bloom) filters.

At 100 TB the dominant cost of a selective fact ⋈ dim join is scanning and
shuffling fact rows that the dim side will discard.  Spark's optimizer can
inject a bloom filter built from the (filtered) dim keys into the fact scan
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) so non-matching rows
die before the exchange — the declarative equivalent of a hand-built
semi-join reduction.  The bloom filter is a *pre*-filter (false positives
pass through; the exact join still applies), so results are identical to the
plain join — which is exactly what makes it oracle-checkable.

``semi_reduction_session`` flips the runtime-filter confs (all runtime-
settable); ``pruned_fact_join`` expresses the join declaratively and lets
Catalyst place the filter.  ``tests/test_analytics.py`` pins the injection
by asserting ``bloom_filter_agg`` / ``might_contain`` appear in the physical
plan once the dim side is above the creation threshold.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_RUNTIME_FILTER_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local test fixtures are far below the 10 MB default creation threshold;
    # production should keep the defaults (a bloom of a huge dim is itself
    # a cost) — callers override per workload
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@contextmanager
def semi_reduction_session(spark: SparkSession, force: bool = False):
    """Enable runtime bloom-filter injection for the duration of the block.

    ``force=True`` additionally disables broadcast joins so the filter is
    observable in local tests (broadcast joins don't need a bloom — the
    whole dim rides along anyway; at scale the shuffle join is the case
    that matters).
    """
    confs = dict(_RUNTIME_FILTER_CONFS)
    if force:
        confs["spark.sql.autoBroadcastJoinThreshold"] = "-1"
        confs["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def pruned_fact_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ filtered-dim join, declared so Catalyst can inject a runtime
    bloom filter on ``fact_key`` built from the dim side.

    The caller applies the selective dim predicate *before* passing ``dim``
    — that selectivity is what makes the bloom worth building.
    """
    return fact.join(dim, fact[fact_key] == dim[dim_key], how)


def physical_plan(df: DataFrame) -> str:
    """Executed-plan string (AQE-final) for plan-shape assertions."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_runtime_bloom(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "bloom_filter_agg" in plan or "might_contain" in plan
