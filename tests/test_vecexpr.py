"""functions/vecexpr numeric contract: the unrolled (codegen) vector
expressions produce BIT-IDENTICAL values to the HOF aggregate(zip_with)
folds they replace, on the real fixture embeddings — this is what lets
the similarity/kmeans/semdedup operators switch form without touching
their oracles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.vecexpr import (
    unrolled_dot,
    unrolled_dot_lits,
    unrolled_sqdist,
)
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


def _hof_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )


def _hof_sqdist(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(cast(x as double) - cast(y as double)) "
        f"* (cast(x as double) - cast(y as double))), "
        f"cast(0 as double), (acc, z) -> acc + z)"
    )


def _pairs(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    a = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("va")
    )
    b = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 40)).select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("vb")
    )
    return a.crossJoin(b)


def test_unrolled_dot_bit_identical_to_hof_fold(spark):
    rows = (
        _pairs(spark)
        .select(
            F.expr(f"({unrolled_dot('va', 'vb', DIM)})").alias("u"),
            F.expr(_hof_dot("va", "vb")).alias("h"),
        )
        .collect()
    )
    assert len(rows) == 400
    for r in rows:
        # bit-identical, not approx: same accumulation order
        assert math.isclose(r.u, r.h, rel_tol=0.0, abs_tol=0.0), (r.u, r.h)


def test_unrolled_sqdist_bit_identical_to_hof_fold(spark):
    rows = (
        _pairs(spark)
        .select(
            F.expr(f"({unrolled_sqdist('va', 'vb', DIM)})").alias("u"),
            F.expr(_hof_sqdist("va", "vb")).alias("h"),
        )
        .collect()
    )
    for r in rows:
        assert r.u == r.h, (r.u, r.h)


def test_unrolled_dot_lits_matches_column_form(spark):
    # a constant plane as literals vs the same plane zip_with'ed as an
    # array column: identical doubles term-for-term
    import numpy as np

    plane = np.random.default_rng(7).standard_normal(DIM)
    arr = "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in plane) + ")"
    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    rows = (
        emb.select(
            F.expr(f"({unrolled_dot_lits('embedding', plane)})").alias("u"),
            F.expr(_hof_dot("embedding", arr)).alias("h"),
        )
        .collect()
    )
    for r in rows:
        assert r.u == r.h, (r.u, r.h)


def test_jl_matmul_projection_matches_sql_fixed_point(spark):
    # the Arrow matmul path (plans/jl_projection.project_embeddings)
    # must emit exactly the integers the SQL fixed-point fold defines
    from star_schema_etl_airflow_spark.plans.jl_projection import (
        _SIGNS,
        JL_K,
        JL_SCALE,
        project_embeddings,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    got = {r["vec_id"]: [r[f"p{k}"] for k in range(JL_K)]
           for r in project_embeddings(emb).collect()}
    ei = (f"transform(embedding, e -> "
          f"cast(floor(cast(e as double) * {JL_SCALE}) as bigint))")

    def hof_proj(k):
        arr = ", ".join(f"{s}L" for s in _SIGNS[k])
        return (f"aggregate(zip_with(__ei, array({arr}), (e, s) -> e * s), "
                f"0L, (acc, x) -> acc + x)")

    want_rows = (
        emb.select("vec_id", F.expr(ei).alias("__ei"))
        .select("vec_id",
                *[F.expr(hof_proj(k)).alias(f"p{k}") for k in range(JL_K)])
        .collect()
    )
    want = {r["vec_id"]: [r[f"p{k}"] for k in range(JL_K)] for r in want_rows}
    assert got == want
