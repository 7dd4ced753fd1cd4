"""Decontamination + deterministic-shuffle invariants.

The differential oracle (``plans/llm_decontam.py``) proves cross-engine
equivalence; these tests pin the *semantics*: planted eval leakage is
found (and only it), the pipeline drop removes exactly the flagged docs,
and the distributed shuffle rank is a pure function of the data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.decontaminate import (
    contamination_flags,
    drop_contaminated,
    gram_hashes_expr,
    overlap_pairs,
)
from star_schema_etl_airflow_spark.operators.sampling import (
    deterministic_shuffle,
    shuffle_sort_key,
)
from star_schema_etl_airflow_spark.plans.llm_decontam import (
    CONTAM_EVERY,
    MIN_SHARED,
    _contaminated_train,
    _split_docs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split(spark):
    ev, tr = _split_docs(spark, SF_DIR)
    return ev.persist(), tr.persist()


def test_planted_contamination_is_found_exactly(spark, split):
    ev, tr = split
    train = _contaminated_train(ev, tr)
    flags = contamination_flags(
        overlap_pairs(train, ev, min_shared=1), MIN_SHARED
    )
    flagged = {
        r.train_id for r in flags.filter("contaminated = 1").collect()
    }
    planted = {
        r.doc_id for r in tr.filter(F.col("doc_id") % CONTAM_EVERY == 0).collect()
    }
    # a planted doc is detectABLE only if its paired eval doc yields at
    # least MIN_SHARED distinct 8-grams (short eval docs can't clear the
    # bar — the documented limitation of n-gram decontamination)
    evr = ev.withColumn(
        "eval_rn", F.row_number().over(Window.orderBy("doc_id")) - 1
    )
    gram_counts = {
        r.eval_rn: r.n
        for r in evr.select(
            "eval_rn", F.expr(f"size({gram_hashes_expr('text')})").alias("n")
        ).collect()
    }
    n_eval = len(gram_counts)
    expected = {d for d in planted if gram_counts[d % n_eval] >= MIN_SHARED}
    assert expected  # the fixture must give a non-vacuous check
    assert expected <= flagged
    # anything else flagged shares >= MIN_SHARED grams by construction of
    # the operator; with 8-grams natural coincidences are essentially nil
    assert len(flagged - expected) <= 0.05 * tr.count()
    # every detectable planted doc swallowed a whole eval doc → frac ~1
    fracs = (
        overlap_pairs(train, ev, min_shared=MIN_SHARED)
        .filter(F.col("train_id").isin(list(expected)))
        .groupBy("train_id")
        .agg(F.max("overlap_frac").alias("f"))
        .collect()
    )
    assert len(fracs) == len(expected)
    assert all(r.f > 0.8 for r in fracs)


def test_drop_contaminated_removes_only_flagged(spark, split):
    ev, tr = split
    train = _contaminated_train(ev, tr)
    kept = drop_contaminated(train, ev, min_shared=MIN_SHARED)
    flagged = {
        r.train_id
        for r in contamination_flags(
            overlap_pairs(train, ev, min_shared=1), MIN_SHARED
        )
        .filter("contaminated = 1")
        .collect()
    }
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    all_ids = {r.doc_id for r in train.select("doc_id").collect()}
    assert kept_ids == all_ids - flagged
    assert flagged  # the planted leakage guarantees a non-vacuous check


def test_overlap_join_broadcasts_eval_side(spark, split):
    ev, tr = split
    plan = overlap_pairs(tr, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shuffle_rank_matches_global_window(spark, split):
    _, tr = split
    got = deterministic_shuffle(tr, "cast(doc_id as string)", "s1")
    w = Window.orderBy(shuffle_sort_key("cast(doc_id as string)", "s1"))
    want = tr.withColumn("pos", F.row_number().over(w).cast("long"))
    assert (
        got.select("doc_id", "pos").exceptAll(want.select("doc_id", "pos")).count()
        == 0
    )


def test_shuffle_is_partitioning_invariant_and_seed_dependent(spark, split):
    _, tr = split
    key = "cast(doc_id as string)"
    a = deterministic_shuffle(tr, key, "e0").select("doc_id", "pos")
    b = deterministic_shuffle(tr.repartition(7), key, "e0", num_partitions=3)
    assert a.exceptAll(b.select("doc_id", "pos")).count() == 0
    c = deterministic_shuffle(tr, key, "e1").select("doc_id", "pos")
    n = tr.count()
    same = a.alias("a").join(
        c.alias("c"),
        (F.col("a.doc_id") == F.col("c.doc_id"))
        & (F.col("a.pos") == F.col("c.pos")),
    ).count()
    assert same < n / 2  # different seed ⇒ (essentially) different permutation
