"""Semantics pins for the incremental MinHash near-dup probe
(plans/llm_dedup2.dedup_incremental_minhash): the oracle sweep proves
engine equality; these pin what the probe MEANS."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
    BATCH_FRESH_OFFSET,
    BATCH_MUTANT_OFFSET,
    dedup_incremental_minhash,
)

SF_DIR = "/root/testdata/sf0.001"


def test_probe_semantics(spark):
    rows = dedup_incremental_minhash(spark, SF_DIR).collect()
    assert len(rows) > 0
    # every match is a batch doc matched to a CORPUS doc above threshold
    for r in rows:
        assert r.batch_id >= BATCH_MUTANT_OFFSET
        assert r.corpus_id < BATCH_MUTANT_OFFSET
        assert r.jaccard >= 0.5
    # reversed-token "fresh" docs share vocabulary but no shingles with
    # their source — the probe must never match them
    assert all(r.batch_id < BATCH_FRESH_OFFSET for r in rows)
    # lightly-edited recrawls match their own source document
    own = [r for r in rows
           if r.batch_id - BATCH_MUTANT_OFFSET == r.corpus_id]
    assert len(own) >= len(rows) // 2


def test_probe_matches_what_a_full_rerun_would_find(spark):
    """Each (mutant, source) match the probe reports carries the same
    exact Jaccard the full self-join family computes — spot-check one
    pair end-to-end through the public tokenizer helpers."""
    from star_schema_etl_airflow_spark.functions.text import (
        jaccard_spark,
        shingle_hashes_spark,
        shingles_spark,
        tokens_spark,
    )

    r = dedup_incremental_minhash(spark, SF_DIR).orderBy(
        "batch_id", "corpus_id").first()
    src_id = r.batch_id - BATCH_MUTANT_OFFSET
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src_text = docs.filter(F.col("doc_id") == src_id).first().text
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        _LIGHT_MUTATE_S,
    )

    pair = spark.createDataFrame(
        [(src_text,)], "text string"
    ).select(
        F.expr(
            jaccard_spark(
                f"array_distinct({shingle_hashes_spark(shingles_spark(tokens_spark('text')))})",
                f"array_distinct({shingle_hashes_spark(shingles_spark(tokens_spark(_LIGHT_MUTATE_S)))})",
            )
        ).alias("j")
    ).first()
    assert abs(pair.j - r.jaccard) < 1e-12


def test_plan_has_no_cartesian_and_probes_only(spark):
    """Equi-join shape pin: band probe + verify joins, never a
    cartesian; and the corpus text is never re-shuffled as text (the
    only corpus-wide relations are the signature/band projections)."""
    df = dedup_incremental_minhash(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
