"""Bucketed co-located join: the plan-level proof that bucketing removes
the shuffle on both sides of a big⋈big equi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.sources.io import write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", n_buckets=8,
    )
    # disable auto-broadcast so a non-bucketed plan WOULD shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == lineitem.count()

        # control: the same join over plain (non-bucketed) scans shuffles
        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert "Exchange" in _plan(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_sorted_merge_ready(spark):
    """bucketBy + sortBy persists sorted buckets (sort-merge joins skip
    the sort too when bucket sort keys match)."""
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(li, "b_li_sorted", "l_orderkey", n_buckets=4,
                   sort_by="l_orderkey")
    try:
        t = spark.table("b_li_sorted")
        assert t.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_sorted")


def test_incremental_dedup_probe_corpus_never_shuffles(spark):
    """SCALE.md's bucketed-at-rest claim for ``dedup_incremental``
    (round-5 verdict task 7): with the corpus 8-byte hash index stored
    as a table bucketed by content_hash, the daily batch's anti-join
    probe plan carries NO Exchange on the corpus side — only the small
    delta repartitions to the index's bucketing.  At 100 TB the corpus
    index is the side that must never shuffle."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.functions.text import md5_long_spark
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        BATCH_RECRAWL_OFFSET,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus_index = docs.select(
        F.expr(md5_long_spark("text")).alias("content_hash")
    )
    write_bucketed(corpus_index, "b_corpus_hash_index", "content_hash",
                   n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + BATCH_RECRAWL_OFFSET).alias("doc_id"), "text"
        )
        hashed = batch.select(
            "doc_id", F.expr(md5_long_spark("text")).alias("content_hash")
        )
        probe = hashed.join(
            spark.table("b_corpus_hash_index"), "content_hash", "left_anti"
        )
        plan = _plan(probe)
        # exactly one Exchange: the delta side matching the bucket spec;
        # the bucketed corpus scan reads in place
        assert plan.count("Exchange") == 1, plan
        corpus_scan = plan[plan.index("b_corpus_hash_index"):]
        assert "Bucketed: true" in corpus_scan, plan
        # every recrawled copy exists in the corpus → anti join drops all
        assert probe.count() == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_corpus_hash_index")


def test_minhash_probe_band_index_never_shuffles(spark):
    """The at-rest claim behind ``dedup_incremental_minhash`` and its
    two-axis curve (r10 verdict task 5): with the corpus band index
    stored bucketed by (band_idx, band_key), the delta-vs-corpus
    candidate join carries exactly ONE Exchange — the freshly banded
    delta repartitioning to the index's bucketing — while the corpus
    band index reads in place."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        band_buckets,
        signature_of,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    cband = band_buckets(signature_of(docs)).select(
        F.col("doc_id").alias("corpus_id"), "band_idx", "band_key")
    write_bucketed(cband, "b_band_index", ["band_idx", "band_key"],
                   n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 123).alias("doc_id"), "text")
        bband = band_buckets(signature_of(batch)).select(
            F.col("doc_id").alias("batch_id"), "band_idx", "band_key")
        probe = bband.join(
            spark.table("b_band_index"), ["band_idx", "band_key"]
        ).select("batch_id", "corpus_id")
        plan = _plan(probe)
        assert plan.count("Exchange") == 1, plan
        corpus_scan = plan[plan.index("b_band_index"):]
        assert "Bucketed: true" in corpus_scan, plan
        assert probe.count() > 0  # mutant recrawls land in shared bands
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_band_index")


def test_substring_probe_gram_index_never_shuffles(spark):
    """Same at-rest claim for ``dedup_substring_incremental``: the
    corpus distinct-gram index bucketed by g, the batch's positional
    grams repartition to it — one Exchange, index in place."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.operators.decontaminate import (
        positional_gram_hashes,
    )
    from star_schema_etl_airflow_spark.plans.substring_queries import _N

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    cidx = docs.select(
        F.explode(F.expr(positional_gram_hashes("text", _N))).alias("g")
    ).distinct()
    write_bucketed(cidx, "b_gram_index", "g", n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 777).alias("doc_id"), "text")
        pos = batch.select(
            "doc_id",
            F.posexplode(
                F.expr(positional_gram_hashes("text", _N))
            ).alias("pos", "g"),
        )
        probe = pos.join(spark.table("b_gram_index"), "g", "left_semi")
        plan = _plan(probe)
        assert plan.count("Exchange") == 1, plan
        corpus_scan = plan[plan.index("b_gram_index"):]
        assert "Bucketed: true" in corpus_scan, plan
        assert probe.count() > 0  # recrawled copies span entirely
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_gram_index")
