"""Time-series anomaly detection over the events stream: EWMA smoothing
and trailing-window z-score spike flags per event type — the monitoring
queries an ingestion pipeline runs on its own volume to catch drops,
floods, and schema-break silences.

Cross-engine exactness (no tolerance, value-hash equal):

- **EWMA** uses the finite-lag form Σ_j α(1−α)^j·c_{t−j}: the weights
  are Python-computed float literals embedded in BOTH engines' plans
  (identical bits), each term is int×double (one IEEE op), and the sum
  is written as an explicit left-associated chain so both engines add
  in the same order.
- **z-score** derives mean/variance from EXACT integer window sums
  (Σx, Σx² over a trailing row frame) with the identical expression
  tree: var = (Σx² − (Σx)²/n)/(n−1), z = (x − mean)/√var.  No
  Welford-vs-naive drift because neither engine's native STDDEV is
  used.

Scale design: one shuffle to the hourly (event_type, hour) grain —
rollup-sized, not event-sized; the lag/frame windows then run inside
each event_type partition (bounded cardinality, no skew; at 100 TB the
hourly grain for a year is ~9k rows per type).  This is the continuous-
aggregate + sliding-stats shape monitoring systems materialize
incrementally; composing it with `operators/ivm.py` keeps the hourly
grain maintained by deltas.

Reference parity: beyond-reference (time-series extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

ALPHA = 0.3
EWMA_LAGS = 12
Z_WINDOW = 24      # trailing buckets in the z-score frame (prior rows only)
Z_MIN_N = 12       # minimum history before a z-score is emitted
Z_THRESHOLD = 3.0
DECIMALS = 9

# identical float literals on both sides (repr roundtrips exactly)
_WEIGHTS = [ALPHA * (1 - ALPHA) ** j for j in range(EWMA_LAGS)]


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("cnt"))


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly counts with finite-lag EWMA smoothing (missing
    lags at series start contribute 0 — the cold-start convention)."""
    h = _hourly(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("hour")
    ewma = None
    for j, wt in enumerate(_WEIGHTS):
        term = F.coalesce(F.lag("cnt", j).over(w), F.lit(0)).cast(
            "double"
        ) * F.lit(wt)
        ewma = term if ewma is None else ewma + term
    return h.select(
        "hour", "event_type", "cnt",
        F.round(ewma, DECIMALS).alias("ewma"),
    )


def _ewma_oracle() -> str:
    terms = " + ".join(
        f"CAST(COALESCE(LAG(cnt, {j}) OVER w, 0) AS DOUBLE) * {wt!r}"
        for j, wt in enumerate(_WEIGHTS)
    )
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT hour, event_type, cnt,
       ROUND({terms}, {DECIMALS}) AS ewma
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour)
"""


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spike/drop detection: z-score of each hourly count against the
    trailing ``Z_WINDOW`` buckets (prior rows only, so the anomaly
    doesn't contaminate its own baseline); NULL until ``Z_MIN_N``
    history or when the baseline is constant (zero variance)."""
    h = _hourly(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-Z_WINDOW, -1)
    )
    n = F.count("cnt").over(w).cast("double")
    s1 = F.sum("cnt").over(w).cast("double")
    s2 = F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    z = F.round((F.col("cnt").cast("double") - mean) / F.sqrt(var), DECIMALS)
    ok = (n >= F.lit(float(Z_MIN_N))) & (var > F.lit(0.0))
    zcol = F.when(ok, z)
    return h.select(
        "hour", "event_type", "cnt",
        zcol.alias("zscore"),
        F.when(ok, F.abs(z) > Z_THRESHOLD).alias("is_anomaly"),
    )


ANOMALY_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT hour, event_type, cnt,
         CAST(COUNT(cnt) OVER w AS DOUBLE) AS n,
         CAST(SUM(cnt) OVER w AS DOUBLE) AS s1,
         CAST(SUM(cnt * cnt) OVER w AS DOUBLE) AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {Z_WINDOW} PRECEDING AND 1 PRECEDING)
)
SELECT hour, event_type, cnt,
       CASE WHEN n >= {float(Z_MIN_N)!r}
                 AND (s2 - s1 * s1 / n) / (n - 1.0) > 0.0
            THEN ROUND((CAST(cnt AS DOUBLE) - s1 / n)
                       / sqrt((s2 - s1 * s1 / n) / (n - 1.0)), {DECIMALS})
       END AS zscore,
       CASE WHEN n >= {float(Z_MIN_N)!r}
                 AND (s2 - s1 * s1 / n) / (n - 1.0) > 0.0
            THEN abs(ROUND((CAST(cnt AS DOUBLE) - s1 / n)
                           / sqrt((s2 - s1 * s1 / n) / (n - 1.0)),
                     {DECIMALS})) > {Z_THRESHOLD!r}
       END AS is_anomaly
FROM stats
"""

register(QuerySpec("events_ewma", events_ewma, _ewma_oracle(),
                   tags=("TIMESERIES",)))
register(QuerySpec("events_anomaly_zscore", events_anomaly_zscore,
                   ANOMALY_ORACLE, tags=("TIMESERIES",)))


# --- Holt linear-trend forecast --------------------------------------------

# Double exponential smoothing (Holt 1957): level + trend recursion
#     l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
#     b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
# is a LINEAR filter: the state s_t = [l_t, b_t] satisfies
# s_t = A·s_{t−1} + c·y_t with A = [[1−α, 1−α], [−αβ, 1−αβ]],
# c = [α, αβ], so s_t = Σ_j (Aʲc)·y_{t−j}.  The finite-lag truncation
# of that sum (missing lags contribute 0 — the EWMA cold-start
# convention above) turns the recursion into the same
# literal-weighted LAG chain as events_ewma: the Aʲc weights are
# Python-computed float64s embedded in BOTH engines' SQL (repr
# round-trips exactly), each term one IEEE multiply, the sum an
# explicit left-associated chain.  The one-step forecast is
# ŷ_{t+1} = l_t + b_t, i.e. weights (Aʲc)[0] + (Aʲc)[1].
HOLT_ALPHA = 0.5
HOLT_BETA = 0.3
HOLT_LAGS = 16     # |eigenvalues of A| ≤ ~0.84 ⇒ truncation < 1% of mass


def _holt_weights() -> tuple[list[float], list[float]]:
    a, b = HOLT_ALPHA, HOLT_BETA
    A = [[1 - a, 1 - a], [-a * b, 1 - a * b]]
    v = [a, a * b]
    lw, tw = [], []
    for _ in range(HOLT_LAGS):
        lw.append(v[0])
        tw.append(v[1])
        v = [A[0][0] * v[0] + A[0][1] * v[1],
             A[1][0] * v[0] + A[1][1] * v[1]]
    return lw, tw


_HOLT_LW, _HOLT_TW = _holt_weights()


def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly level/trend estimates and the one-step-ahead
    forecast — the capacity-planning companion to the z-score monitor
    (is the hourly volume TRENDING up, and what should the next bucket
    hold?).  Same rollup-sized shuffle + per-type lag windows as
    events_ewma; at 100 TB the weights ride the same hourly grain."""
    h = _hourly(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("hour")

    def chain(weights: list[float]):
        acc = None
        for j, wt in enumerate(weights):
            term = F.coalesce(F.lag("cnt", j).over(w), F.lit(0)).cast(
                "double"
            ) * F.lit(wt)
            acc = term if acc is None else acc + term
        return acc

    level, trend = chain(_HOLT_LW), chain(_HOLT_TW)
    return h.select(
        "hour", "event_type", "cnt",
        F.round(level, DECIMALS).alias("level"),
        F.round(trend, DECIMALS).alias("trend"),
        F.round(level + trend, DECIMALS).alias("forecast_next"),
    )


def _holt_oracle() -> str:
    def chain(weights: list[float]) -> str:
        return " + ".join(
            f"CAST(COALESCE(LAG(cnt, {j}) OVER w, 0) AS DOUBLE) * {wt!r}"
            for j, wt in enumerate(weights)
        )

    lvl, trd = chain(_HOLT_LW), chain(_HOLT_TW)
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT hour, event_type, cnt,
       ROUND({lvl}, {DECIMALS}) AS level,
       ROUND({trd}, {DECIMALS}) AS trend,
       ROUND(({lvl}) + ({trd}), {DECIMALS}) AS forecast_next
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour)
"""


register(QuerySpec("events_holt_forecast", events_holt_forecast,
                   _holt_oracle(), tags=("TIMESERIES",)))


# --- forecast accuracy evaluation -------------------------------------------


def forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality evaluation as a query — the time-series member
    of the eval family (retrieval/dedup/ANN/graph evals elsewhere):
    one-step-ahead accuracy of three forecasters on the hourly series,
    each predicting bucket t from data ≤ t−1 only:

    - ``naive``: last value (the no-skill baseline every forecast must
      beat);
    - ``ewma``: the EWMA level, lagged one bucket;
    - ``holt``: level + trend, lagged one bucket (trend-aware).

    Errors are |cnt − forecast| per (type, hour) with at least one
    predecessor; the mean goes through exact DECIMAL sums (the repo's
    order-independence trick — a double AVG would drift with
    partitioning), so MAE/MSE are value-hash exact cross-engine.
    Scale shape: same rollup-sized grain + per-type lag windows as the
    forecasters themselves; the final aggregate is 3 rows."""
    h = _hourly(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("hour")

    def lag_chain(weights: list[float], shift: int):
        acc = None
        for j, wt in enumerate(weights):
            term = F.coalesce(
                F.lag("cnt", j + shift).over(w), F.lit(0)
            ).cast("double") * F.lit(wt)
            acc = term if acc is None else acc + term
        return acc

    naive = F.lag("cnt", 1).over(w).cast("double")
    ewma_f = lag_chain(_WEIGHTS, 1)
    holt_f = lag_chain(_HOLT_LW, 1) + lag_chain(_HOLT_TW, 1)
    scored = h.select(
        "event_type", "hour", "cnt",
        naive.alias("f_naive"),
        ewma_f.alias("f_ewma"),
        holt_f.alias("f_holt"),
    ).filter(F.col("f_naive").isNotNull())

    def metrics(fcol: str, name: str) -> DataFrame:
        err = F.col("cnt").cast("double") - F.col(fcol)
        return scored.agg(
            F.lit(name).alias("method"),
            F.count(F.lit(1)).alias("n_evaluated"),
            F.round(
                F.sum(F.abs(err).cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                DECIMALS,
            ).alias("mae"),
            F.round(
                F.sum((err * err).cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                DECIMALS,
            ).alias("mse"),
        )

    return (
        metrics("f_naive", "naive")
        .unionByName(metrics("f_ewma", "ewma"))
        .unionByName(metrics("f_holt", "holt"))
    )


def _forecast_eval_oracle() -> str:
    def chain(weights: list[float], shift: int) -> str:
        return " + ".join(
            f"CAST(COALESCE(LAG(cnt, {j + shift}) OVER w, 0) AS DOUBLE)"
            f" * {wt!r}"
            for j, wt in enumerate(weights)
        )

    ewma_f = chain(_WEIGHTS, 1)
    holt_f = f"({chain(_HOLT_LW, 1)}) + ({chain(_HOLT_TW, 1)})"

    def m(fexpr: str, name: str) -> str:
        err = f"(CAST(cnt AS DOUBLE) - {fexpr})"
        return f"""
  SELECT '{name}' AS method,
         COUNT(*) AS n_evaluated,
         ROUND(CAST(SUM(CAST(ABS({err}) AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), {DECIMALS}) AS mae,
         ROUND(CAST(SUM(CAST({err} * {err} AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), {DECIMALS}) AS mse
  FROM scored WHERE f_naive IS NOT NULL"""

    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, hour, cnt,
         CAST(LAG(cnt, 1) OVER w AS DOUBLE) AS f_naive,
         {ewma_f} AS f_ewma,
         {holt_f} AS f_holt
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour)
)
{m('f_naive', 'naive')}
UNION ALL
{m('f_ewma', 'ewma')}
UNION ALL
{m('f_holt', 'holt')}
"""


register(QuerySpec("forecast_eval", forecast_eval, _forecast_eval_oracle(),
                   tags=("TIMESERIES", "EVAL")))
