"""Event-stream analytics over the ``events`` fixture — the batch halves
of the streaming surface (SURVEY.md §2.9 extension): tumbling-window
aggregation and gap-based sessionization.

``streaming/ingest.py`` runs the same tumbling aggregation as a
Structured Streaming job with a watermark; these batch forms are the
oracle-checkable twins (identical grouping semantics), which is exactly
how a lambda-free architecture validates its streaming path.

Scale design: tumbling aggregation is a plain hash aggregate on
(hour, event_type) — partial-agg friendly, no skew (time buckets are
uniform).  Sessionization shuffles once on user_id (Spark's
``session_window`` merges per-key sorted runs); at 100 TB the shuffle is
the unavoidable cost and the key space (users) is large enough to spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions import safe_divide
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SESSION_GAP = "30 minutes"


def _sum_value(col) -> F.Column:
    """Order-independent exact sum of the double ``value`` column."""
    return F.sum(col.cast("decimal(28,10)")).cast("double")


def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour × event-type rollup: counts, distinct users, exact value
    sum, mean value (batch twin of the streaming windowed aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _sum_value(F.col("value")).alias("total_value"),
        )
        .withColumn("avg_value", safe_divide(F.col("total_value"), F.col("n_events")))
    )


EVENTS_TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts)   AS hour,
       event_type,
       COUNT(*)                 AS n_events,
       COUNT(DISTINCT user_id)  AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: events of one user within 30 minutes of
    each other form a session (Spark ``session_window``: start = first
    event, end = last event + gap)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP))
        .agg(
            F.count("*").alias("n_events"),
            _sum_value(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


EVENTS_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT *, SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_id
"""

def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rollup (1-hour windows every 30 minutes): each event
    lands in exactly two overlapping windows.  Batch twin of the streaming
    sliding aggregate (``streaming/enrich.py``); the oracle reproduces
    Spark's epoch-aligned window assignment by exploding each event into
    its two window starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _sum_value(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


EVENTS_SLIDING_ORACLE = """
WITH e AS (
  SELECT event_type, value,
         date_trunc('hour', ts)
           + INTERVAL '30 minutes' * CAST(floor(date_part('minute', ts) / 30) AS INTEGER)
           AS hb
  FROM events
),
x AS (
  SELECT event_type, value,
         unnest([hb, hb - INTERVAL '30 minutes']) AS win_start
  FROM e
)
SELECT win_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
FROM x
GROUP BY 1, 2
"""

register(QuerySpec("events_tumbling", events_tumbling, EVENTS_TUMBLING_ORACLE,
                   tags=("streaming-batch-twin",)))
register(QuerySpec("events_sessionize", events_sessionize, EVENTS_SESSIONIZE_ORACLE,
                   tags=("streaming-batch-twin",)))
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase attribution within 1 hour per user — the batch twin
    of the stream-stream interval join (``streaming/joins.py``)."""
    from star_schema_etl_airflow_spark.streaming.joins import (
        batch_attribution,
    )

    return batch_attribution(spark, sf_dir)


EVENTS_ATTRIBUTION_ORACLE = """
SELECT p.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       p.value    AS purchase_value
FROM events p
JOIN events v
  ON v.user_id = p.user_id
 AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
"""

register(QuerySpec("events_sliding", events_sliding, EVENTS_SLIDING_ORACLE,
                   tags=("streaming-batch-twin",)))
register(QuerySpec("events_attribution", events_attribution,
                   EVENTS_ATTRIBUTION_ORACLE,
                   tags=("streaming-batch-twin", "J2")))
