#!/usr/bin/env python
"""Measured multi-batch cost curve for the streaming retrieval fold —
the ``retrieval_stream`` twin of ``kmv_stream_curve.py``.

``streaming/retrieval_stream.py`` scores each delta micro-batch against
the FROZEN at-rest BM25 index and folds it into the standing per-query
top-k lists.  The 100 TB claim has two axes:

- **batches axis**: the persisted state is k-bounded (queries × k rows
  forever), so per-batch cost is the batch's own tokenize+score plus a
  list-sized merge — flat as cumulative ingest grows with B;
- **corpus axis**: the at-rest corpus participates ONLY through the
  frozen index (|query-terms| rows, broadcast), so per-batch cost must
  be ~flat as the AT-REST corpus grows ×4 (the index build itself is
  paid once, outside the drain).

This tool measures both: a grid of (at-rest corpus size × batches),
each cell draining B one-file micro-batches through
``run_retrieval_stream`` (availableNow, one file per micro-batch).

Usage: python tools/retrieval_stream_curve.py >> SCALE.md
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/retrieval_stream_curve"
DOCS_PER_BATCH = 500
TOKENS_PER_DOC = 40
# vocabulary mixes the BM25 query terms into synthetic filler so every
# batch produces real score rows for every query
QUERY_TERMS = ["vector", "hash", "merge", "stream", "window", "join",
               "customer", "query", "filter"]

BATCHES = [8, 16, 32]
AT_REST = [2_000, 8_000]


def pyloop() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def _doc_text(expr_id: str, salt: str) -> str:
    """Deterministic token stream: ~10% query terms, rest filler."""
    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    return (
        f"concat_ws(' ', transform(sequence(1, {TOKENS_PER_DOC}), i -> "
        f"CASE WHEN pmod(hash({expr_id} * 131 + i * 7), 10) = 0 "
        f"THEN element_at(array({terms}), "
        f"cast(pmod(hash({expr_id} + i), {len(QUERY_TERMS)}) + 1 as int)) "
        f"ELSE concat('{salt}w', pmod(hash({expr_id} * 9973 + i), 50000)) "
        f"END))"
    )


def build_at_rest(spark, n_docs: int):
    from pyspark.sql import functions as F

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(_doc_text("id", "ar")).alias("text"),
    )


def build_landing(spark, batches: int) -> str:
    from pyspark.sql import functions as F

    out = f"{WORK}/landing_b{batches}"
    if os.path.isdir(out):
        return out
    os.makedirs(out)
    for b in range(batches):
        df = spark.range(DOCS_PER_BATCH).select(
            (F.col("id") + 1_000_000 + b * DOCS_PER_BATCH).alias("doc_id"),
            F.expr(_doc_text("id", f"b{b}")).alias("text"),
        )
        staging = f"{WORK}/stage"
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging)
                    if f.startswith("part-") and f.endswith(".parquet"))
        fpath = os.path.join(out, f"batch_{b:03d}.parquet")
        os.rename(os.path.join(staging, part), fpath)
        t = 1_700_000_000 + b
        os.utime(fpath, (t, t))
    return out


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.functions.caching import persist_once
    from star_schema_etl_airflow_spark.plans.bm25 import (
        bm25_query_index,
        bm25_score_with_index,
    )
    from star_schema_etl_airflow_spark.plans.retrieval_incremental import (
        _topk,
    )
    from star_schema_etl_airflow_spark.session import get_spark
    from star_schema_etl_airflow_spark.streaming.retrieval_stream import (
        _publish_swap,
        run_retrieval_stream,
    )

    spark = get_spark("retrieval-stream-curve")
    spark.sparkContext.setLogLevel("ERROR")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    cal = [pyloop()]

    rows = []
    for n_at in AT_REST:
        # at-rest artifacts: built ONCE per corpus version, outside the
        # timed drain (that is the deployment contract)
        at_rest = build_at_rest(spark, n_at)
        qidf = persist_once(bm25_query_index(spark, at_rest))
        at_topk = persist_once(
            _topk(bm25_score_with_index(at_rest, qidf))
            .select("query_id", "doc_id", "score")
        )
        qidf.count(), at_topk.count()   # materialize untimed
        for b in BATCHES:
            landing = build_landing(spark, b)
            run_dir = f"{WORK}/run_n{n_at}_b{b}"
            if os.path.isdir(run_dir):
                shutil.rmtree(run_dir)
            os.makedirs(run_dir)
            state = os.path.join(run_dir, "state")
            _publish_swap(at_topk, state)
            t0 = time.perf_counter()
            final = run_retrieval_stream(spark, landing, state, schema, qidf)
            wall = time.perf_counter() - t0
            n_state = final.count()
            rows.append((n_at, b, round(wall, 2), round(wall / b, 3),
                         n_state))
            print(f"  at_rest={n_at} batches={b}: total {wall:.1f}s, "
                  f"per-batch {wall / b:.2f}s, state {n_state} rows",
                  file=sys.stderr)
        cal.append(pyloop())

    print()
    print("## Streaming retrieval fold: batches × at-rest-corpus cost "
          "curve (round 13)")
    print()
    print("`run_retrieval_stream` drains B one-file micro-batches against")
    print("a FROZEN at-rest index; per-batch cost = total drain wall / B.")
    print("The standing state is k-bounded (queries × k rows forever) and")
    print("the at-rest corpus participates only through the broadcast")
    print("index, so per-batch cost must stay flat along BOTH axes.")
    print()
    print(f"Host pyloop stamps: {cal}.  {DOCS_PER_BATCH} docs × "
          f"{TOKENS_PER_DOC} tokens per batch.")
    print()
    print("| at-rest docs | batches | total | per-batch | state rows |")
    print("|---|---|---|---|---|")
    for n_at, b, wall, per, n in rows:
        print(f"| {n_at} | {b} | {wall:.1f}s | {per:.2f}s | {n} |")


if __name__ == "__main__":
    main()
