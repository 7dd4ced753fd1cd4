"""Arrow-vectorized Python UDAF surface: a ``pandas_udf`` GROUPED_AGG
(weighted median) — the sanctioned shape for custom aggregations that
genuinely need Python (here: a stand-in for any scipy/numpy-backed
statistic), oracle-checked against a window-based SQL formulation.

Scale notes: GROUPED_AGG ships each group's columns to Python as Arrow
batches — group sizes must be memory-bounded (the same constraint as
collect_list, see ``a12_string_agg``); for unbounded groups the two-pass
sketch quantile (``plans/llm_text.py``) is the scale path and this UDAF
is the exact small-group twin.  Determinism: weights are integral
doubles (exact cumulative sums ≤ 2^53) and ties in the sort key collapse
to the same output value, so pandas' cumsum and the oracle's running
window agree bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table


def _weighted_median_udf():
    # built lazily: the pandas_udf decorator parses its DDL return type
    # through the ACTIVE SparkSession, so a module-level decoration
    # breaks any import that happens before a session exists (observed:
    # pytest collection of the registry)
    @F.pandas_udf("double")
    def _weighted_median(price: pd.Series, qty: pd.Series) -> float:
        df = pd.DataFrame({"p": price, "q": qty}).sort_values("p")
        cum = df["q"].cumsum()
        total = df["q"].sum()
        return float(df["p"][cum >= total / 2].iloc[0])

    return _weighted_median


def pudf_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag via a
    GROUPED_AGG pandas UDF (Arrow batches, one Python call per group)."""
    _weighted_median = _weighted_median_udf()
    li = load_table(spark, sf_dir, "lineitem")
    # GROUPED_AGG pandas UDFs cannot mix with JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT) — run the plain count as its own
    # aggregation and join on the (tiny) group key
    med = li.groupBy("l_returnflag").agg(
        _weighted_median("l_extendedprice", "l_quantity").alias("wmedian")
    )
    cnt = li.groupBy("l_returnflag").agg(F.count("*").alias("n_lines"))
    return med.join(cnt, "l_returnflag")


PUDF_WMEDIAN_ORACLE = """
WITH c AS (
  SELECT l_returnflag,
         l_extendedprice AS p,
         SUM(l_quantity) OVER (
           PARTITION BY l_returnflag ORDER BY l_extendedprice
           ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
),
n AS (SELECT l_returnflag, COUNT(*) AS n_lines FROM lineitem GROUP BY 1)
SELECT c.l_returnflag, MIN(c.p) AS wmedian, MIN(n.n_lines) AS n_lines
FROM c JOIN n ON n.l_returnflag = c.l_returnflag
WHERE c.cw >= c.tw / 2
GROUP BY 1
"""

register(QuerySpec("pudf_weighted_median", pudf_weighted_median,
                   PUDF_WMEDIAN_ORACLE, tags=("PUDF", "A4")))


# --- Python UDTF ------------------------------------------------------------


def udtf_token_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) exploding each document into
    8-token lines with positions, invoked per-row via LATERAL — the
    table-function twin of the builtin-generator chunker
    (``chunk_documents``), for logic that genuinely needs Python.
    Deterministic (pure function of the row), so fully oracle-checked;
    the builtin-expression chunker remains the hot-path default (UDTFs
    pay the Python-worker round trip)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, line string")
    class SplitLines:
        def eval(self, text: str):
            toks = text.split()
            for i in range((len(toks) + 7) // 8):
                yield i, " ".join(toks[i * 8:(i + 1) * 8])

    spark.udtf.register("split_lines", SplitLines)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.line "
        "FROM __udtf_docs d, LATERAL split_lines(d.text) t"
    )


UDTF_LINES_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS tk
  FROM documents WHERE doc_id < 100
),
chunks AS (
  SELECT doc_id,
         unnest(range(0, CAST(CEIL(len(tk) / 8.0) AS INT))) AS pos,
         tk
  FROM toks
)
SELECT doc_id, CAST(pos AS INT) AS pos,
       array_to_string(tk[pos * 8 + 1 : pos * 8 + 8], ' ') AS line
FROM chunks
"""

register(QuerySpec("udtf_token_lines", udtf_token_lines, UDTF_LINES_ORACLE,
                   tags=("UDTF", "G1")))
