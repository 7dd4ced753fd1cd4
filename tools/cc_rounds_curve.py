#!/usr/bin/env python
"""Round-count curve: min-label propagation vs large/small-star on
adversarial chain graphs (the worst case for diameter-bounded
propagation).  Round counts are deterministic — this tool is safe to
run on a busy host, unlike the timing curves.

Usage: python tools/cc_rounds_curve.py  → markdown table on stdout
(paste into SCALE.md).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAIN_LENS = [8, 16, 32, 64, 128, 256]


def main() -> None:
    from pyspark.sql import SparkSession

    from star_schema_etl_airflow_spark.operators.components import (
        big_star_components,
        connected_components,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("| chain nodes | min-label rounds | large/small-star rounds |")
    print("|---|---|---|")
    for n in CHAIN_LENS:
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long"
        )
        s_simple: dict = {}
        s_star: dict = {}
        simple = connected_components(edges, stats=s_simple, max_iter=1000)
        star = big_star_components(edges, stats=s_star)
        got_a = {(r.node, r.component) for r in simple.collect()}
        got_b = {(r.node, r.component) for r in star.collect()}
        want = {(i, 0) for i in range(n)}
        assert got_a == want and got_b == want, f"label mismatch at n={n}"
        print(f"| {n} | {s_simple['rounds']} | {s_star['rounds']} |")


if __name__ == "__main__":
    main()
