"""Time-series operators over the ``events`` fixture: bucketed range join,
hypertable-style multi-granularity rollup, and JSON property extraction.

No reference equivalent (the reference is a daily-batch sales ELT); these
extend the engine's surface for event/time-series workloads the way
TimescaleDB hypertables and Databricks/DuckDB range-join binning do — but
expressed as plain DataFrame plans so Catalyst keeps optimizing them.

Scale design (100 TB):

- **Range join** (`events_range_join`): the naive plan for "events of the
  same user within the 30 min before each purchase" is an equi-join on
  ``user_id`` whose range predicate runs as a post-join filter — per-user
  event history × purchases blowup for power users.  The bucketed band
  join bins both sides into window-sized time buckets and joins on
  ``(user_id, bucket)``, replicating each build row into the 2 buckets it
  can influence; the join key now bounds candidates to ±1 window, so
  fan-out per probe is O(events in 2 buckets), independent of history
  length.  This is the standard range-join binning rewrite, done with two
  DataFrame ops (explode + equi-join) that AQE can still re-plan.
- **Hypertable rollup** (`hypertable_rollup`): the day aggregate is
  derived from the persisted *hour* aggregate, never from raw events —
  decomposable aggregates (COUNT→SUM, SUM→SUM, MIN/MAX→MIN/MAX) reagg
  losslessly, and distinct users carry as per-hour partial sets merged at
  day grain (the exact-set stand-in for the HLL sketch merge you'd use at
  100 TB; the operator shape — partial per fine bucket, merge at coarse
  bucket — is identical).  The differential oracle computes the day grain
  directly from raw events, so a green row *proves* the reaggregation is
  lossless.
- **JSON extraction** (`events_json_extract`): ``get_json_object`` is a
  JVM built-in (no UDF); the projection is map-only and prunes to the two
  columns it reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions import safe_divide
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

WINDOW_SECONDS = 30 * 60  # range-join lookback = bucket width

# --- bucketed range join ---------------------------------------------------


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: count/distinct-types/value-sum of the same
    user's events in the strict 30-minute window before it.

    Band-join construction: probe (purchases) keyed by its time bucket;
    build (all events) replicated to its own bucket and the next one —
    a window ``[ts-30m, ts)`` starting in bucket ``k`` only reaches
    builds in buckets ``k-1`` and ``k``, so equality on the replicated
    bucket covers exactly the candidates.  Each build row meets a given
    probe through one bucket only (the probe's own), so no dedup step
    is needed.  The exact range predicate then filters candidates.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp("ts") / WINDOW_SECONDS)

    probe = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", bucket.alias("bucket"))
        .alias("a")
    )
    build = (
        ev.select(
            F.col("user_id").alias("b_user_id"),
            F.col("ts").alias("b_ts"),
            F.col("event_type").alias("b_type"),
            F.col("value").alias("b_value"),
            F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
        )
        .alias("b")
    )
    joined = probe.join(
        build,
        (F.col("a.user_id") == F.col("b.b_user_id"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("b.b_ts") >= F.col("a.ts") - F.expr(f"INTERVAL {WINDOW_SECONDS} SECOND"))
        & (F.col("b.b_ts") < F.col("a.ts")),
        "left",
    )
    return joined.groupBy("a.event_id").agg(
        F.count("b.b_ts").alias("n_prior_events"),
        F.countDistinct("b.b_type").alias("n_prior_types"),
        F.coalesce(
            F.sum(F.col("b.b_value").cast("decimal(28,10)")), F.lit(0)
        ).cast("double").alias("prior_value"),
    )


EVENTS_RANGE_JOIN_ORACLE = f"""
SELECT a.event_id,
       COUNT(b.ts) AS n_prior_events,
       COUNT(DISTINCT b.event_type) AS n_prior_types,
       CAST(COALESCE(SUM(CAST(b.value AS DECIMAL(28,10))), 0) AS DOUBLE) AS prior_value
FROM events a
LEFT JOIN events b
  ON b.user_id = a.user_id
 AND b.ts >= a.ts - INTERVAL {WINDOW_SECONDS} SECOND
 AND b.ts <  a.ts
WHERE a.event_type = 'purchase'
GROUP BY a.event_id
"""

# --- hypertable rollup: hour partials → day merge --------------------------


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event-type rollup computed FROM the hour rollup (continuous-
    aggregate style).  Counts/sums/min/max reagg as decomposable
    aggregates; distinct users merge from per-hour partial sets."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        ).agg(
            F.count("*").alias("h_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("h_value"),
            F.min("value").alias("h_min"),
            F.max("value").alias("h_max"),
            F.collect_set("user_id").alias("h_users"),
        )
    )
    return (
        hourly.groupBy(
            F.to_date("hour").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("h_events").alias("n_events"),
            F.sum("h_value").cast("double").alias("total_value"),
            F.min("h_min").alias("min_value"),
            F.max("h_max").alias("max_value"),
            F.size(F.array_distinct(F.flatten(F.collect_list("h_users")))).alias(
                "n_users"
            ),
        )
        .withColumn("avg_value", safe_divide(F.col("total_value"), F.col("n_events")))
    )


HYPERTABLE_ROLLUP_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(DISTINCT date_trunc('hour', ts)) AS n_hours,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(COUNT(DISTINCT user_id) AS INTEGER) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2
"""

# --- JSON property extraction ----------------------------------------------


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the ``props`` JSON column (JVM built-in ``get_json_object``)
    and aggregate the extracted value per event type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


EVENTS_JSON_EXTRACT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS k_min,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max,
       COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_distinct_k
FROM events
GROUP BY 1
"""

register(QuerySpec("events_range_join", events_range_join,
                   EVENTS_RANGE_JOIN_ORACLE, headline=True,
                   tags=("range-join", "streaming-batch-twin")))
register(QuerySpec("hypertable_rollup", hypertable_rollup,
                   HYPERTABLE_ROLLUP_ORACLE,
                   tags=("rollup", "streaming-batch-twin")))
register(QuerySpec("events_json_extract", events_json_extract,
                   EVENTS_JSON_EXTRACT_ORACLE,
                   tags=("json",)))


def events_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (merge_asof semantics): each purchase picks up
    the most recent view at-or-before it for the same user — via the
    single-shuffle union+window operator (``operators/pit.py::
    as_of_backward``), differentially checked against DuckDB's native
    ASOF LEFT JOIN."""
    from star_schema_etl_airflow_spark.operators.pit import as_of_backward

    ev = load_table(spark, sf_dir, "events")
    # right side must be unique per (user, ts): keep the max view value
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_view_value"))
        .select("user_id", "ts", F.col("ts").alias("last_view_ts"),
                "last_view_value")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "ts",
        F.col("value").alias("purchase_value"),
    )
    return as_of_backward(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["last_view_ts", "last_view_value"],
    ).withColumnRenamed("ts", "purchase_ts")


EVENTS_ASOF_ENRICH_ORACLE = """
WITH v AS (
  SELECT user_id, ts, MAX(value) AS last_view_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.ts AS purchase_ts, p.purchase_id, p.purchase_value,
       v.ts AS last_view_ts, v.last_view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
"""

register(QuerySpec("events_asof_enrich", events_asof_enrich,
                   EVENTS_ASOF_ENRICH_ORACLE, headline=True,
                   tags=("J2", "asof")))


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling: one row per (user, day) between each
    user's first and last active day — missing days zero-filled, plus the
    running cumulative value.  The dense-spine prerequisite for
    time-series models and window features over sparse activity.

    Spark-first shape: per-user bounds (tiny agg) → ``explode(sequence)``
    builds the spine WITHOUT a cross join against a global calendar —
    each user only materializes their own span; the left join back is
    co-partitioned on user_id with the daily rollup."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(28,10)")).alias("__v"),
        F.count("*").alias("n_events"),
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            "d",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("__v"), F.lit(0).cast("decimal(28,10)")).alias("__v"),
        )
        .select(
            "user_id",
            "d",
            "n_events",
            F.col("__v").cast("double").alias("day_value"),
            F.sum("__v").over(w).cast("double").alias("cum_value"),
        )
    )


EVENTS_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         SUM(CAST(value AS DECIMAL(28,10))) AS v,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                              CAST(d1 AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
filled AS (
  SELECT s.user_id, s.d,
         COALESCE(dl.n_events, 0) AS n_events,
         COALESCE(dl.v, CAST(0 AS DECIMAL(28,10))) AS v
  FROM spine s LEFT JOIN daily dl ON s.user_id = dl.user_id AND s.d = dl.d
)
SELECT user_id, d, n_events,
       CAST(v AS DOUBLE) AS day_value,
       CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY d
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value
FROM filled
"""

register(QuerySpec("events_gap_fill", events_gap_fill,
                   EVENTS_GAP_FILL_ORACLE, tags=("timeseries", "G1")))


def events_map_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function census: parse the JSON ``props`` into a typed
    map and exercise size / element_at / sorted map_keys — the semi-
    structured column path (from_json into MapType rather than schema-om
    struct, for open key sets)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
    )


EVENTS_MAP_CENSUS_ORACLE = """
SELECT event_id,
       CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_csv
FROM events
"""

register(QuerySpec("events_map_census", events_map_census,
                   EVENTS_MAP_CENSUS_ORACLE, tags=("json", "map-census")))


def sessions_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: user sessions × error-spike hours (the
    incident windows from ``events_error_spike``) with exact overlap
    duration — "which sessions were exposed to which incidents".

    Scale shape: spike hours are hour-ALIGNED intervals, so each session
    explodes into the hours it covers and the join is an EQUI join on the
    hour — no nested-loop interval join, and the explode fan-out is
    bounded by session length (gap-capped).  The overlap arithmetic is
    exact integer microseconds."""
    from star_schema_etl_airflow_spark.plans.events_queries import (
        events_error_spike,
        events_sessionize,
    )

    sessions = events_sessionize(spark, sf_dir).select(
        "user_id", "session_start", "session_end"
    )
    spikes = (
        events_error_spike(spark, sf_dir)
        .filter(F.col("is_spike"))
        .select(F.col("hour").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("interval 1 hour"))
    )
    exploded = sessions.withColumn(
        "hour",
        F.explode(
            F.expr(
                "sequence(date_trunc('hour', session_start), "
                "date_trunc('hour', session_end), interval 1 hour)"
            )
        ),
    )
    joined = exploded.join(
        F.broadcast(spikes), exploded.hour == spikes.w_start
    )
    return (
        joined.withColumn(
            "overlap_us",
            F.expr(
                "unix_micros(least(session_end, w_end))"
                " - unix_micros(greatest(session_start, w_start))"
            ),
        )
        .filter(F.col("overlap_us") > 0)
        .select(
            "user_id", "session_start", F.col("w_start").alias("spike_hour"),
            "overlap_us",
        )
    )


SESSIONS_INCIDENT_ORACLE = """
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
),
sessions AS (
  SELECT user_id, MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 30 MINUTE AS session_end
  FROM numbered GROUP BY user_id, session_id
),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY 1
),
sp AS (
  SELECT hour AS w_start, hour + INTERVAL 1 HOUR AS w_end
  FROM (
    SELECT hour, n_errors,
           CAST(SUM(n_errors) OVER w AS DOUBLE)
             / CAST(COUNT(n_errors) OVER w AS DOUBLE) AS trailing_mean
    FROM hourly
    WINDOW w AS (ORDER BY hour ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
  )
  WHERE trailing_mean IS NOT NULL
    AND CAST(n_errors AS DOUBLE) > 2.0 * trailing_mean
)
SELECT s.user_id, s.session_start, sp.w_start AS spike_hour,
       epoch_us(least(s.session_end, sp.w_end))
         - epoch_us(greatest(s.session_start, sp.w_start)) AS overlap_us
FROM sessions s
JOIN sp ON s.session_start < sp.w_end AND sp.w_start < s.session_end
WHERE epoch_us(least(s.session_end, sp.w_end))
        - epoch_us(greatest(s.session_start, sp.w_start)) > 0
"""

register(QuerySpec("sessions_incident_overlap", sessions_incident_overlap,
                   SESSIONS_INCIDENT_ORACLE,
                   tags=("range-join", "interval-overlap")))
