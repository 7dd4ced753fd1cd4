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


def test_quantized_cosine_preserves_topk_recall(spark):
    """int8 codes must be good enough to drive ANN: top-10 by quantized
    cosine (codes + per-vector scale) recalls >= 90% of the exact fp32
    top-10 per query on the fixture corpus."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.plans.llm_quantize import quantize_int8
    from star_schema_etl_airflow_spark.plans.llm_similarity import (
        N_QUERIES,
        TOP_K,
        embed_topk_cosine,
    )
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    emb = quantize_int8(
        load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ).select("vec_id", "scale", "qvec")
    # dequantized cosine: (q_a * s_a) . (q_b * s_b) factors the scales out
    # of the per-element products, so score on raw codes and rescale once
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_q"),
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("qvec").alias("q_c"),
    )
    dot = ("aggregate(zip_with(q_q, q_c, (x, y) -> cast(x as double) * "
           "cast(y as double)), cast(0 as double), (a, v) -> a + v)")
    norm = lambda col: (f"sqrt(aggregate({col}, cast(0 as double), "
                        f"(a, x) -> a + cast(x as double) * cast(x as double)))")
    scored = q.crossJoin(c).select(
        "query_id", "cand_id",
        F.expr(f"{dot} / ({norm('q_q')} * {norm('q_c')})").alias("qcos"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("cand_id")
    )
    approx_top = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= TOP_K)
        .select("query_id", "cand_id")
    )
    exact_top = embed_topk_cosine(spark, SF_DIR).select("query_id", "cand_id")
    hits = approx_top.join(exact_top, ["query_id", "cand_id"]).count()
    assert hits >= 0.9 * N_QUERIES * TOP_K, hits


def test_chunks_cover_document_exactly(spark):
    """Chunk windows must tile each document: first chunk starts at 1,
    consecutive starts differ by the step, and the last chunk reaches
    exactly the end of the text — no gap, no spill-over."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.plans.llm_text import (
        CHUNK_CHARS,
        CHUNK_OVERLAP,
        chunk_documents,
    )
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs)
    step = CHUNK_CHARS - CHUNK_OVERLAP
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.min("chunk_start").alias("first_start"),
            F.max(F.col("chunk_start") + F.length("chunk_text") - 1)
            .alias("last_end"),
            F.count("*").alias("n"),
            F.max("n_chunks").alias("declared"),
        )
        .join(docs.select("doc_id", F.length("text").alias("len")), "doc_id")
    )
    bad = per_doc.filter(
        (F.col("first_start") != 1)
        | (F.col("last_end") != F.col("len"))
        | (F.col("n") != F.col("declared"))
    )
    assert bad.count() == 0
    # every non-final chunk is exactly chunk_chars long
    short = chunks.filter(
        (F.col("chunk_idx") < F.col("n_chunks") - 1)
        & (F.length("chunk_text") != CHUNK_CHARS)
    )
    assert short.count() == 0
