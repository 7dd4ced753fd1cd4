"""Idempotent persist for re-invoked query functions.

Every registered query is a function ``(spark, sf_dir) -> DataFrame``
that bench/correctness harnesses call repeatedly (warmup pass + 4
timed passes per bench run).  A bare ``df.persist()`` inside such a
function re-registers the same analyzed plan with the CacheManager on
every call — Spark dedupes the entry (no double materialization) but
logs ``CacheManager: Asked to cache already cached data`` each time
(r7 verdict task 7).  ``persist_once`` checks the CacheManager first:
when an identical plan is already cached, the existing
``InMemoryRelation`` is substituted into ANY matching query at
planning time, so simply returning the DataFrame un-persisted yields
the same runtime plan with no warning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def persist_once(df: DataFrame) -> DataFrame:
    """``df.persist()``, skipped when an identical plan is already in
    the session's CacheManager (plan-substitution makes the existing
    entry serve this DataFrame regardless)."""
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        if cm.lookupCachedData(df._jdf).isDefined():
            return df
    except Exception:
        # private-API probe only — fall through to the public call
        pass
    return df.persist()
