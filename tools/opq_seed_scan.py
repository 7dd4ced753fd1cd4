#!/usr/bin/env python
"""Codes-only recall of the OPQ-rotated IVFADC vs the unrotated
trained index, across rotation seeds — the measurement behind
``plans/ivfpq_opq.OPQ_SEED``.  Deterministic given (seed, sf), safe on
a busy host.

Usage: python tools/opq_seed_scan.py [sf_dir] [seed ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
SEEDS = [int(s) for s in sys.argv[2:]] or [0, 1, 2, 3, 4, 5, 6, 7]


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.plans.ivfpq import (
        _adc_scores,
        embed_ivfpq_trained,
    )
    from star_schema_etl_airflow_spark.plans import ivfpq_opq as opq
    from star_schema_etl_airflow_spark.plans.pq import (
        N_QUERIES,
        TOP_K,
        _SV_S,
    )
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.expr(_SV_S).alias("sv")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("sv").alias("qsv")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("sv").alias("csv2")
    )
    d_exact = (
        "aggregate(zip_with(qsv, csv2, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, v) -> acc + v)"
    )
    we = Window.partitionBy("query_id").orderBy("d", "cand_id")
    exact = {
        (r.query_id, r.cand_id)
        for r in F.broadcast(q).crossJoin(c)
        .select("query_id", "cand_id", F.expr(d_exact).alias("d"))
        .withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .collect()
    }
    denom = float(len(exact))

    def recall(df) -> float:
        got = {(r.query_id, r.cand_id) for r in df.collect()}
        return len(got & exact) / denom

    base = recall(embed_ivfpq_trained(spark, SF_DIR))
    print(f"trained (no rotation): recall@{TOP_K} = {base:.4f}")
    wr = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    for seed in SEEDS:
        adc, _ = _adc_scores(
            spark, SF_DIR,
            cells_of=lambda s, d, _seed=seed: opq._trained_cells(s, d).select(
                "cell", F.expr(opq._rot_spark("csv", _seed)).alias("csv")
            ),
            rotate=opq._rot_spark("sv", seed),
        )
        topk = (
            adc.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "cand_id")
        )
        r = recall(topk)
        flag = "  <-- beats trained" if r > base else ""
        print(f"opq seed {seed}: recall@{TOP_K} = {r:.4f}{flag}")


if __name__ == "__main__":
    main()
