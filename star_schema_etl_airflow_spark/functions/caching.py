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

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)
_warned_no_jvm = False


def persist_once(df: DataFrame) -> DataFrame:
    """``df.persist()``, skipped when an identical plan is already in
    the session's CacheManager (plan-substitution makes the existing
    entry serve this DataFrame regardless).

    The probe uses private JVM accessors (``_jsparkSession``/``_jdf``)
    that do not exist under Spark Connect; there it degrades to a plain
    ``persist()`` (correct, but the CacheManager warning this exists to
    suppress returns) — logged once at debug so the mode is observable.
    """
    global _warned_no_jvm
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        if cm.lookupCachedData(df._jdf).isDefined():
            return df
    except Exception:
        if not _warned_no_jvm:
            _log.debug(
                "persist_once: JVM CacheManager probe unavailable "
                "(Spark Connect?) — degrading to plain persist()"
            )
            _warned_no_jvm = True
    return df.persist()
