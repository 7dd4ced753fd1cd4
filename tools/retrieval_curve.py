#!/usr/bin/env python
"""Two-axis scale curve for the incremental retrieval probe
(r12 verdict task 6 — the retrieval twin of ``incremental_curve.py``).

``retrieval_incremental``'s 100 TB story: a delta ingest batch is
scored against the FROZEN at-rest BM25 statistics and merged into the
standing top-k lists; the corpus participates only through two
materialized artifacts (the |q|-row query index and the k-row-per-query
top-k lists).  This measures that claim on the factored probe
(``bm25_delta_probe``) over the same two axes as the dedup probes:

- **delta axis**: corpus FIXED at ×8 of sf0.1, delta grown — expected
  exponent ≈ 1.0 (probe work is delta-proportional);
- **corpus axis**: delta FIXED, corpus grown ×4→×32 — expected ≈ flat
  (the at-rest artifacts are control-plane sized; the probe plan
  contains no corpus scan at all — pinned in
  ``tests/test_retrieval_incremental.py``).  Index build times are
  reported alongside: they are the corpus-sized cost the probe AVOIDS
  paying per batch.

Per-cell protocol mirrors incremental_curve.py: artifacts materialized
once per corpus (as local relations — they are 9 and ≤30 rows, the
production shape is a dimension-table write); every timed trial probes
with a FRESH delta plan (per-trial id salt); min-of-3.

Usage: python tools/retrieval_curve.py >> SCALE_CURVE.md
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from incremental_curve import build_docs_only, pyloop  # noqa: E402

DELTA_SALT_BASE = 8_000_000_000


def make_delta(docs, m: int, salt: int):
    """New-document ingest batch at tunable density: every m-th doc
    re-ingested under a fresh id (the probe scores CONTENT; new ids
    make every trial a cold plan against the warm artifacts)."""
    from pyspark.sql import functions as F

    off = DELTA_SALT_BASE + salt * 100_000_000
    return docs.filter(F.col("doc_id") % m == 0).select(
        (F.col("doc_id") + off).alias("doc_id"), "text"
    )


def main() -> None:
    from star_schema_etl_airflow_spark.plans.bm25 import (
        bm25_query_index,
        bm25_score_with_index,
    )
    from star_schema_etl_airflow_spark.plans.retrieval_incremental import (
        _topk,
        bm25_delta_probe,
    )
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark("retrieval-curve")
    spark.sparkContext.setLogLevel("ERROR")
    cal = [pyloop()]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    def docs_of(factor: int):
        d = build_docs_only(spark, factor)
        return spark.read.parquet(f"{d}/documents.parquet") \
            .select("doc_id", "text")

    def build_artifacts(corpus, trials: int = 2):
        """At-rest artifacts as standalone local relations (they are
        control-plane sized); best-of-N build time = the avoided cost."""
        best_t = None
        qidf_rows = topk_rows = None
        for _ in range(trials):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qidf = bm25_query_index(spark, corpus)
            qidf_rows = qidf.collect()
            qidf_local = spark.createDataFrame(
                qidf_rows,
                "query_id int, term string, w long, n_docs long, "
                "sum_dl long",
            )
            topk_rows = (
                _topk(bm25_score_with_index(corpus, qidf_local))
                .select("query_id", "doc_id", "score").collect()
            )
            dt = time.perf_counter() - t0
            best_t = dt if best_t is None or dt < best_t else best_t
        qidf_local = spark.createDataFrame(
            qidf_rows,
            "query_id int, term string, w long, n_docs long, sum_dl long",
        )
        topk_local = spark.createDataFrame(
            topk_rows, "query_id int, doc_id long, score decimal(38,9)"
        )
        return qidf_local, topk_local, round(best_t, 3)

    def timed_probe(corpus_docs, qidf, at_topk, m: int, trials: int = 3):
        best = None
        for t in range(trials):
            delta = make_delta(corpus_docs, m, salt=t)
            t0 = time.perf_counter()
            materialize(bm25_delta_probe(delta, qidf, at_topk))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    def expo(tl, th, ratio) -> float:
        return math.log(th / tl) / math.log(ratio)

    # ---- axis A: fixed corpus (×8), growing delta ----------------------
    fixed = docs_of(8).persist()
    fixed.count()
    qidf, at_topk, _ = build_artifacts(fixed)
    ms = [16, 8, 4, 2]
    # codegen warmup
    materialize(bm25_delta_probe(make_delta(fixed, ms[0], 9), qidf, at_topk))
    rows_a = []
    for m in ms:
        nd = make_delta(fixed, m, 0).count()
        tp = timed_probe(fixed, qidf, at_topk, m)
        rows_a.append((nd, tp))
        print(f"  delta-axis m={m}: {nd} docs, probe {tp}s",
              file=sys.stderr)
    cal.append(pyloop())
    fixed.unpersist()

    # ---- axis B: fixed delta (from the ×4 corpus), growing corpus ------
    small = docs_of(4).persist()
    small.count()
    nd_fixed = make_delta(small, 7, 0).count()
    rows_b = []
    for f in [4, 8, 16, 32]:
        corpus = docs_of(f)
        qidf, at_topk, t_build = build_artifacts(corpus)
        tp = timed_probe(small, qidf, at_topk, 7)
        rows_b.append((f, t_build, tp))
        print(f"  corpus-axis x{f}: probe {tp}s (artifact build "
              f"{t_build}s)", file=sys.stderr)
        cal.append(pyloop())
    small.unpersist()

    # ---- report ---------------------------------------------------------
    print()
    print("## Incremental retrieval probe two-axis curve "
          "(r12 verdict task 6)")
    print()
    print("`bm25_delta_probe`: delta scored against the frozen at-rest")
    print("query index, merged into the standing top-k lists; the probe")
    print("plan contains no corpus scan (pinned in")
    print("tests/test_retrieval_incremental.py).  Artifact build times")
    print("are the corpus-sized cost the probe avoids per batch.")
    print()
    print(f"Host pyloop stamps: {cal}.")
    print()
    print("### Delta axis — corpus fixed at ×8 of sf0.1")
    print()
    print("| delta docs | probe |")
    print("|---|---|")
    for nd, tp in rows_a:
        print(f"| {nd} | {tp:.2f}s |")
    e = expo(rows_a[0][1], rows_a[-1][1], rows_a[-1][0] / rows_a[0][0])
    print()
    print(f"Delta-axis exponent (first→last cell): **{e:.2f}**.")
    print()
    print(f"### Corpus axis — delta fixed at {nd_fixed} docs")
    print()
    print("| corpus | artifact build | probe |")
    print("|---|---|---|")
    for f, tb, tp in rows_b:
        print(f"| ×{f} | {tb:.2f}s | {tp:.2f}s |")
    e = expo(rows_b[0][2], rows_b[-1][2], rows_b[-1][0] / rows_b[0][0])
    print()
    print(f"Corpus-axis probe exponent (×4→×32): **{e:.2f}** "
          "(expected ≈ flat; the artifact-build column carries the "
          "corpus-sized growth instead).")


if __name__ == "__main__":
    main()
