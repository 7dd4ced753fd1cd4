"""Sketch-based summaries: count-min heavy hitters over the document
corpus and distribution percentiles over line-item revenue.

No reference equivalent; these are the approximate-summary operators a
100 TB training-data pipeline leans on when exact global state is too big:

- **Count-min sketch** (`cms_heavy_hitters`): D×W counters, each row an
  independent hash of the token — a fixed ~16 KB summary regardless of
  corpus size.  The sketch is built with one ``groupBy (d, bucket)``
  (mergeable across partitions/days by plain addition — partial aggs do
  the merge for free), and point estimates are ``min`` over the D rows.
  The query returns the exact top-K tokens WITH their CMS estimates, so
  the differential oracle pins both the sketch construction and the
  estimate lookup; ``estimate >= exact`` (one-sided error) is asserted in
  tests.  At scale only the sketch (not the vocab) crosses stages; the
  exact top-K here is the verification harness, not the scale path.
- **Percentiles** (`revenue_percentiles`): exact linear-interpolation
  quantiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``), rounded to
  6 decimals for cross-engine float parity.  The 100 TB path swaps in
  ``percentile_approx`` (t-digest, mergeable) — same plan shape, bounded
  memory; the exact form stays as its small-scale oracle.

Hash parity note: CMS bucket hashes are the repo-standard seeded
``md5_long % W`` (see ``functions/text.py``) so both engines build
bit-identical sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    md5_long_spark,
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

CMS_DEPTH = 4      # independent hash rows
CMS_WIDTH = 512    # counters per row
TOP_K = 50

# --- count-min sketch heavy hitters ----------------------------------------


def _cms_bucket_spark(tok_expr: str, d: int) -> str:
    return f"{md5_long_spark(tok_expr, f'cms{d}')} % {CMS_WIDTH}"


def _cms_bucket_duck(tok_expr: str, d: int) -> str:
    return f"{md5_long_duck(tok_expr, f'cms{d}')} % {CMS_WIDTH}"


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-K tokens by frequency, each with its count-min estimate.

    Plan: one explode+groupBy for exact token counts; the sketch is a
    second groupBy of the same counts ``stack``-ed into (d, bucket) cells;
    the estimate joins the K winners to their D cells and takes ``min``.
    The top-K window ranks the vocabulary (small) — ties broken by token
    for determinism.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.expr(tokens_spark("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("exact_count"))
    )

    stack_args = ", ".join(
        f"{d}, {_cms_bucket_spark('token', d)}" for d in range(CMS_DEPTH)
    )
    cells = counts.select(
        F.col("exact_count").alias("cnt"),
        F.expr(f"stack({CMS_DEPTH}, {stack_args}) as (d, bucket)"),
    )
    sketch = cells.groupBy("d", "bucket").agg(F.sum("cnt").alias("cell_count"))

    w = Window.orderBy(F.col("exact_count").desc(), F.col("token"))
    topk = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )
    probes = topk.select(
        "token",
        "exact_count",
        "rank",
        F.expr(f"stack({CMS_DEPTH}, {stack_args}) as (d, bucket)"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("token", "exact_count", "rank")
        .agg(F.min("cell_count").alias("cms_estimate"))
    )


def _duck_cms_cells() -> str:
    parts = [
        f"SELECT {d} AS d, {_cms_bucket_duck('token', d)} AS bucket, cnt FROM counts"
        for d in range(CMS_DEPTH)
    ]
    return "\nUNION ALL\n".join(parts)


def _duck_cms_probes() -> str:
    parts = [
        f"SELECT token, exact_count, rank, {d} AS d,"
        f" {_cms_bucket_duck('token', d)} AS bucket FROM topk"
        for d in range(CMS_DEPTH)
    ]
    return "\nUNION ALL\n".join(parts)


CMS_HEAVY_HITTERS_ORACLE = f"""
WITH counts AS (
  SELECT token, COUNT(*) AS cnt
  FROM (SELECT unnest({tokens_duck('text')}) AS token FROM documents)
  GROUP BY token
),
cells AS (
{_duck_cms_cells()}
),
sketch AS (
  SELECT d, bucket, CAST(SUM(cnt) AS BIGINT) AS cell_count
  FROM cells GROUP BY d, bucket
),
topk AS (
  SELECT token, cnt AS exact_count,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rank
  FROM counts
  QUALIFY rank <= {TOP_K}
),
probes AS (
{_duck_cms_probes()}
)
SELECT p.token, p.exact_count, p.rank,
       MIN(s.cell_count) AS cms_estimate
FROM probes p JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
GROUP BY p.token, p.exact_count, p.rank
"""

# --- exact percentiles (approx-ready plan shape) ----------------------------

_REV_S = "l_extendedprice * (1 - l_discount)"


def revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of per-line revenue by return flag (exact linear
    interpolation; swap ``percentile`` → ``percentile_approx`` for the
    mergeable t-digest at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.expr(_REV_S).cast("double")
    return (
        li.select("l_returnflag", rev.alias("rev"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.expr("percentile(rev, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(rev, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(rev, 0.99)"), 6).alias("p99"),
        )
    )


REVENUE_PERCENTILES_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       ROUND(quantile_cont(CAST({_REV_S} AS DOUBLE), 0.5), 6) AS p50,
       ROUND(quantile_cont(CAST({_REV_S} AS DOUBLE), 0.9), 6) AS p90,
       ROUND(quantile_cont(CAST({_REV_S} AS DOUBLE), 0.99), 6) AS p99
FROM lineitem
GROUP BY l_returnflag
"""

register(QuerySpec("cms_heavy_hitters", cms_heavy_hitters,
                   CMS_HEAVY_HITTERS_ORACLE, headline=True,
                   tags=("sketch", "LLM-text")))
register(QuerySpec("revenue_percentiles", revenue_percentiles,
                   REVENUE_PERCENTILES_ORACLE,
                   tags=("sketch",)))
