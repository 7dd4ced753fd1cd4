"""Tests for the text-curation scale paths in ``plans/llm_text.py``."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.llm_text import (
    quality_gate_approx,
    quality_percentile_gate,
)
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ttr_frame(spark):
    docs = load_table(spark, SF_DIR, "documents")
    toks = "split(lower(text), '[^a-z0-9]+')"
    return docs.select(
        "doc_id",
        "lang",
        F.expr(
            f"cast(size(array_distinct({toks})) as double)"
            f" / cast(size({toks}) as double)"
        ).alias("ttr"),
    )


def test_quality_gate_approx_matches_exact(spark):
    """The approx gate's kept fraction per language must sit within the
    sketch's rank-error bound of the exact percent_rank gate."""
    ttr = _ttr_frame(spark)
    rel_err = 0.01
    approx = quality_gate_approx(ttr, "lang", "ttr", q=0.25, rel_err=rel_err)
    exact = quality_percentile_gate(spark, SF_DIR)

    tot = {r["lang"]: r["n"] for r in
           ttr.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    ka = {r["lang"]: r["n"] for r in
          approx.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    ke = {r["lang"]: r["n"] for r in
          exact.groupBy("lang").agg(F.count("*").alias("n")).collect()}

    for lang, n in tot.items():
        fa = ka.get(lang, 0) / n
        fe = ke.get(lang, 0) / n
        # rank error rel_err plus one row of tie slack on the tiny fixture
        assert abs(fa - fe) <= rel_err + 2.0 / n, (lang, fa, fe, n)


def test_quality_gate_approx_plan_has_no_window(spark):
    """The scale path must plan as aggregate + broadcast join — no Window
    operator, no sort of the full relation by language."""
    ttr = _ttr_frame(spark)
    gated = quality_gate_approx(ttr)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_percentile_approx" in plan, plan


def test_quality_gate_approx_keeps_schema(spark):
    ttr = _ttr_frame(spark)
    gated = quality_gate_approx(ttr)
    assert set(gated.columns) == {"doc_id", "lang", "ttr"}
    assert gated.count() > 0


def test_quantize_int8_error_bound_and_range(spark):
    """Symmetric int8 quantization invariants: every code in [-127, 127],
    reconstruction error <= scale/2 (half a quantization step), and a
    zero vector quantizes to all zeros with scale 0."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.plans.llm_quantize import quantize_int8
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    q = quantize_int8(emb)
    bad = q.filter(
        (F.expr("exists(qvec, v -> v < -127 or v > 127)"))
        | (F.col("max_abs_err") > F.col("scale") / 2 + 1e-12)
    )
    assert bad.count() == 0

    zero = spark.createDataFrame(
        [(1, [0.0] * 4)], "vec_id int, embedding array<float>"
    )
    row = quantize_int8(zero).collect()[0]
    assert row.scale == 0.0 and list(row.qvec) == [0, 0, 0, 0]
    assert row.max_abs_err == 0.0
