"""Pins for the multimodal curation decision
(plans/curation_multimodal.py): union-drop policy semantics and
plan shape.  Engine equality is the oracle sweep's job."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.curation_multimodal import (
    curation_multimodal,
)

SF_DIR = "/root/testdata/sf0.001"


def test_union_drop_policy(spark):
    df = curation_multimodal(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    # keep is exactly the negation of the union
    for r in rows:
        assert r.keep == (not (r.dup_text or r.dup_image or r.dup_audio))
    # every modality contributes: the corpus amplifier guarantees text
    # dups, and the synthetic media guarantee image/audio motif groups
    assert any(r.dup_text for r in rows)
    assert any(r.dup_image for r in rows)
    assert any(r.dup_audio for r in rows)
    # the flags genuinely disagree somewhere (text copies have offset
    # ids, hence different media — the realistic recrawl case)
    assert any(r.dup_text and not r.dup_image for r in rows) or \
        any(r.dup_image and not r.dup_text for r in rows)
    # something survives
    assert any(r.keep for r in rows)


def test_one_row_per_corpus_doc(spark):
    from star_schema_etl_airflow_spark.plans.llm_dedup import build_corpus

    n_corpus = build_corpus(spark, SF_DIR).count()
    df = curation_multimodal(spark, SF_DIR)
    assert df.count() == n_corpus
    assert df.select("doc_id").distinct().count() == n_corpus


def test_lowest_id_of_a_motif_group_is_kept_in_that_modality(spark):
    """The drop policy keeps the lowest id of every matched pair, so a
    doc with dup_image=True must have a lower-id image near-dup, and
    the minimum doc_id of the corpus can never be dropped by any
    modality."""
    df = curation_multimodal(spark, SF_DIR)
    lowest = df.agg(F.min("doc_id")).first()[0]
    r = df.filter(F.col("doc_id") == lowest).first()
    assert r.keep


def test_plan_has_no_cartesian(spark):
    df = curation_multimodal(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
