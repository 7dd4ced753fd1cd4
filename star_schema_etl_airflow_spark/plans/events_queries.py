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

def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen date; for each
    (cohort, day-offset) the distinct active users and the retention rate
    vs the cohort size.

    Scale: one shuffle to find first-seen per user, one distinct over
    (user, day), one shuffle on user_id for the join (co-partitioned with
    the first agg — AQE reuses the exchange), then a tiny aggregate.
    Cohort sizes (one row per date) are broadcast."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    sizes = first.groupBy("cohort_date").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff("d", "cohort_date").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_date")
        .withColumn(
            "retention",
            F.col("n_active").cast("double") / F.col("cohort_size").cast("double"),
        )
        .select("cohort_date", "day_offset", "n_active", "cohort_size", "retention")
    )


EVENTS_RETENTION_ORACLE = """
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_date, COUNT(DISTINCT user_id) AS cohort_size
  FROM first GROUP BY cohort_date
),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
ret AS (
  SELECT f.cohort_date,
         CAST(date_diff('day', f.cohort_date, a.d) AS INTEGER) AS day_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM active a JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT r.cohort_date, r.day_offset, r.n_active, s.cohort_size,
       CAST(r.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
FROM ret r JOIN sizes s USING (cohort_date)
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel signup → view → purchase: each later stage
    must occur after the user's earliest timestamp of the previous stage.
    Returns a one-row summary with stage counts and conversion rates.

    Scale: three per-user MIN aggregates chained by user_id equi-joins —
    every shuffle is on the same key so AQE/exchange-reuse co-partitions
    them; each stage's output is ≤ one row per user."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    base = s.join(v, "user_id", "left").join(p, "user_id", "left")
    return base.agg(
        F.count("*").alias("n_signup"),
        F.count("view_ts").alias("n_view"),
        F.count("purchase_ts").alias("n_purchase"),
    ).select(
        "n_signup",
        "n_view",
        "n_purchase",
        (F.col("n_view").cast("double") / F.col("n_signup").cast("double"))
        .alias("view_rate"),
        (F.col("n_purchase").cast("double") / F.col("n_view").cast("double"))
        .alias("purchase_rate"),
    )


EVENTS_FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
v AS (
  SELECT e.user_id, MIN(e.ts) AS view_ts
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s.signup_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > v.view_ts
  GROUP BY e.user_id
),
agg AS (
  SELECT COUNT(*) AS n_signup,
         COUNT(v.view_ts) AS n_view,
         COUNT(p.purchase_ts) AS n_purchase
  FROM s LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)
)
SELECT n_signup, n_view, n_purchase,
       CAST(n_view AS DOUBLE) / CAST(n_signup AS DOUBLE) AS view_rate,
       CAST(n_purchase AS DOUBLE) / CAST(n_view AS DOUBLE) AS purchase_rate
FROM agg
"""


register(QuerySpec("events_sliding", events_sliding, EVENTS_SLIDING_ORACLE,
                   tags=("streaming-batch-twin",)))
register(QuerySpec("events_retention", events_retention,
                   EVENTS_RETENTION_ORACLE, tags=("analytics",)))
register(QuerySpec("events_funnel", events_funnel, EVENTS_FUNNEL_ORACLE,
                   tags=("analytics",)))
register(QuerySpec("events_attribution", events_attribution,
                   EVENTS_ATTRIBUTION_ORACLE,
                   tags=("streaming-batch-twin", "J2")))


def events_error_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational anomaly detection: hours where the error count exceeds
    2× the trailing-6-hour mean.  All arithmetic is integer counts and
    int/int division in double — deterministic in both engines.

    Scale: the hourly rollup is the only shuffle; the trailing window
    runs over the (bounded, one-row-per-hour) series, so a single
    partition is fine at any raw-event volume."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n_errors")
    )
    w = Window.orderBy("hour").rowsBetween(-6, -1)
    return (
        hourly.withColumn(
            "trailing_mean",
            F.sum("n_errors").over(w).cast("double")
            / F.count("n_errors").over(w).cast("double"),
        )
        .withColumn(
            "is_spike",
            F.when(
                F.col("trailing_mean").isNotNull()
                & (F.col("n_errors").cast("double") > 2.0 * F.col("trailing_mean")),
                True,
            ).otherwise(False),
        )
    )


EVENTS_ERROR_SPIKE_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY 1
),
t AS (
  SELECT hour, n_errors,
         CAST(SUM(n_errors) OVER w AS DOUBLE)
           / CAST(COUNT(n_errors) OVER w AS DOUBLE) AS trailing_mean
  FROM hourly
  WINDOW w AS (ORDER BY hour ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
)
SELECT hour, n_errors, trailing_mean,
       CASE WHEN trailing_mean IS NOT NULL
             AND CAST(n_errors AS DOUBLE) > 2.0 * trailing_mean
            THEN TRUE ELSE FALSE END AS is_spike
FROM t
"""

register(QuerySpec("events_error_spike", events_error_spike,
                   EVENTS_ERROR_SPIKE_ORACLE, tags=("analytics", "W3")))


# --- user event sequences: ordered per-entity histories for training -------

SEQ_MAX_LEN = 20


def events_user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type sequences, truncated to SEQ_MAX_LEN —
    the behavioral-pretraining primitive (next-event prediction, session
    models): every example is an entity's history in deterministic
    (ts, event_id) order.

    Spark-first shape: ``collect_list(struct(ts, event_id, event_type))``
    under a hash aggregate, then ``sort_array`` + ``slice`` + field
    projection — the sort happens per group AFTER the shuffle (each
    group's own rows only), not as a global sort; the shuffle key
    (user_id) is high-cardinality and skew-free.  Compare
    ``deterministic_shuffle`` for corpus-level ordering; this is the
    per-entity version.

    The sequence is *emitted* as a '|'-joined string (the array form
    stays internal): the differential harness canonicalizes results
    through pandas, which cannot hash/sort list-typed cells — a scalar
    canonical form keeps the query exactly checkable."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                f"transform(slice(sort_array(collect_list("
                f"struct(ts, event_id, event_type))), 1, {SEQ_MAX_LEN}), "
                f"s -> s.event_type)"
            ).alias("seq_arr"),
        )
        .select(
            "user_id",
            "n_events",
            F.array_join("seq_arr", "|").alias("seq"),
            F.expr("size(seq_arr)").alias("seq_len"),
        )
    )


EVENTS_SEQ_ORACLE = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       array_to_string((list(event_type ORDER BY ts, event_id))[1:{SEQ_MAX_LEN}],
                       '|') AS seq,
       CAST(LEAST(COUNT(*), {SEQ_MAX_LEN}) AS INTEGER) AS seq_len
FROM events
GROUP BY user_id
"""

register(QuerySpec("events_user_sequences", events_user_sequences,
                   EVENTS_SEQ_ORACLE, tags=("LLM-sequences", "A1")))
