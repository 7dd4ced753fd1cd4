#!/usr/bin/env python
"""Measured BPE training cost across corpus scale factors — the
"corpus is read ONCE, every round is vocab-sized" claim of
``operators/bpe.py`` (round-14 oracle queries ``bpe_train_merges`` /
``bpe_encode_census``).

Expectation: total training wall grows far slower than the ×10 corpus
steps because only the initial word-frequency aggregation is
corpus-sized; the 20 merge rounds run over the word table, whose size
is the VOCABULARY (unique words), which grows sublinearly in corpus
bytes (Heaps' law — here a bounded synthetic vocabulary, so nearly
flat).

TIMING-SENSITIVE: run on a quiet host.
Usage: python tools/bpe_curve.py >> SCALE.md
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def pyloop() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.operators.bpe import (
        train_bpe_ranked,
        word_frequencies,
    )
    from star_schema_etl_airflow_spark.plans.bpe_queries import N_MERGES
    from star_schema_etl_airflow_spark.session import get_spark
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    spark = get_spark("bpe-curve")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup outside the timed cells
    train_bpe_ranked(
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("text"), 2,
    )
    cal = [pyloop()]
    rows = []
    for sf in SFS:
        docs = load_table(spark, f"/root/testdata/{sf}", "documents")
        n_docs = docs.count()
        vocab = word_frequencies(docs.select("text")).count()
        t0 = time.perf_counter()
        merges, _words = train_bpe_ranked(docs.select("text"), N_MERGES)
        wall = round(time.perf_counter() - t0, 2)
        rows.append((sf, n_docs, vocab, len(merges), wall,
                     round(wall / len(merges), 3)))
        print(f"  {sf}: docs={n_docs} vocab={vocab} wall={wall}s",
              file=sys.stderr)
        cal.append(pyloop())

    print()
    print(f"## BPE training cost across corpus scale (r14; {N_MERGES} "
          "merge rounds)")
    print()
    print(f"`train_bpe_ranked` wall per SF.  host_pyloop {cal}")
    print()
    print("| sf | docs | unique words | rounds | total | per round |")
    print("|---|---|---|---|---|---|")
    for sf, n, v, r, w, pr in rows:
        print(f"| {sf} | {n} | {v} | {r} | {w}s | {pr}s |")


if __name__ == "__main__":
    main()
