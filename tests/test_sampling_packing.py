"""Invariants for deterministic sampling/splitting/mixing and sequence
packing — the properties a training-data pipeline relies on at scale:
partitioning-independence, split disjointness, mixture proportions, and
bin-capacity safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.packing import (
    bin_utilization,
    pack_greedy,
)
from star_schema_etl_airflow_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    mix_to_weights,
    mixture_fractions,
)
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"
KEY = "cast(doc_id as string)"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


# --- sampling / splitting -------------------------------------------------


def test_sample_is_partitioning_independent(spark):
    docs = _docs(spark)
    a = deterministic_sample(docs, KEY, 0.37, "s1").select("doc_id")
    b = deterministic_sample(docs.repartition(13), KEY, 0.37, "s1").select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_different_seeds_give_independent_samples(spark):
    docs = _docs(spark)
    a = set(r.doc_id for r in
            deterministic_sample(docs, KEY, 0.5, "sA").select("doc_id").collect())
    b = set(r.doc_id for r in
            deterministic_sample(docs, KEY, 0.5, "sB").select("doc_id").collect())
    n = docs.count()
    overlap = len(a & b) / n
    # independent 50% samples overlap ~25%; far from 50% (same) or 0%
    assert 0.10 < overlap < 0.40, overlap


def test_split_is_disjoint_and_total(spark):
    docs = _docs(spark)
    split = hash_split(docs, KEY, "sp", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    per = {r["split"]: r["n"]
           for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(per.values()) == n              # fractions sum to 1 → total
    assert split.select("doc_id").distinct().count() == n   # disjoint
    assert 0.7 < per["train"] / n < 0.9


def test_mixture_fractions_hit_weights_exactly_in_expectation():
    fracs = mixture_fractions(
        {"en": 1000, "fr": 100, "de": 100},
        {"en": 0.5, "fr": 0.25, "de": 0.25},
    )
    # fr/de are binding (100/0.25=400 = factor); en keeps 200/1000
    assert fracs == {"en": 0.2, "fr": 1.0, "de": 1.0}
    # expected sampled sizes realize the weights: 200/400, 100/400, 100/400


def test_mix_to_weights_proportions(spark):
    docs = _docs(spark)
    weights = {"en": 0.4, "es": 0.2, "fr": 0.2, "de": 0.1, "zh": 0.1}
    mixed = mix_to_weights(docs, "lang", KEY, weights, "m1")
    per = {r["lang"]: r["n"]
           for r in mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(per.values())
    for lang, w in weights.items():
        assert abs(per[lang] / total - w) < 0.08, (lang, per, total)


# --- packing --------------------------------------------------------------


def _packed(spark, capacity=256):
    docs = _docs(spark).withColumn("tokens_i", F.expr("(n_chars + 3) div 4"))
    return pack_greedy(docs, "doc_id", "tokens_i", capacity, n_shards=4)


def test_packing_preserves_every_doc_once(spark):
    docs = _docs(spark)
    packed = _packed(spark)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_no_bin_exceeds_capacity_unless_single_doc(spark):
    cap = 256
    util = bin_utilization(_packed(spark, cap), cap)
    over = util.filter((F.col("bin_tokens") > cap) & (F.col("n_docs") > 1))
    assert over.count() == 0, over.collect()


def test_packing_is_partitioning_independent(spark):
    docs = _docs(spark).withColumn("tokens_i", F.expr("(n_chars + 3) div 4"))
    a = pack_greedy(docs, "doc_id", "tokens_i", 256, n_shards=4)
    b = pack_greedy(docs.repartition(17), "doc_id", "tokens_i", 256, n_shards=4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ffd_beats_or_ties_next_fit_and_stays_valid(spark):
    """First-fit-decreasing is guaranteed ≤ next-fit bins (same order) —
    and must remain a valid packing: every doc once, no bin over cap."""
    from star_schema_etl_airflow_spark.operators.packing import pack_ffd

    cap = 256
    docs = _docs(spark).withColumn("tokens_i", F.expr("(n_chars + 3) div 4"))

    def total_bins(p):
        return sum(
            r.n
            for r in p.groupBy("shard")
            .agg(F.countDistinct("bin_id").alias("n"))
            .collect()
        )

    nf_key = pack_greedy(docs, "doc_id", "tokens_i", cap, n_shards=4)
    nf_desc = pack_greedy(
        docs, "doc_id", "tokens_i", cap, n_shards=4, order="tokens_desc"
    )
    ffd = pack_ffd(docs, "doc_id", "tokens_i", cap, n_shards=4)

    assert total_bins(ffd) <= min(total_bins(nf_key), total_bins(nf_desc))
    assert ffd.count() == docs.count()
    assert ffd.select("doc_id").distinct().count() == docs.count()
    over = bin_utilization(ffd, cap).filter(
        (F.col("bin_tokens") > cap) & (F.col("n_docs") > 1)
    )
    assert over.count() == 0


def test_packing_is_reasonably_tight(spark):
    """Greedy in stable order should waste far less than half the space:
    mean utilization of non-final bins stays above 70%."""
    cap = 256
    util = bin_utilization(_packed(spark, cap), cap)
    # drop each shard's last (possibly near-empty) bin
    last = util.groupBy("shard").agg(F.max("bin_id").alias("bin_id"))
    body = util.join(last, ["shard", "bin_id"], "left_anti")
    mean_util = body.agg(F.avg("utilization")).first()[0]
    assert mean_util is not None and mean_util > 0.7, mean_util


def test_training_shards_bounded_and_manifest_consistent(spark, tmp_path):
    from star_schema_etl_airflow_spark.operators.packing import (
        write_training_shards,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "n_chars"
    )
    n = docs.count()
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs, path, "cast(doc_id as string)", shard_rows=64,
        token_col="n_chars",
    ).collect()

    # every shard bounded; all rows accounted for; positions partition 1..N
    assert all(r.n_rows <= 64 for r in manifest)
    assert sum(r.n_rows for r in manifest) == n
    assert min(r.first_pos for r in manifest) == 1
    assert max(r.last_pos for r in manifest) == n
    # written data matches: per-shard counts agree with the manifest
    back = spark.read.parquet(path)
    counts = {r.shard: r["count"] for r in back.groupBy("shard").count().collect()}
    assert counts == {r.shard: r.n_rows for r in manifest}
    # token sums are exact
    assert sum(r.n_tokens for r in manifest) == (
        docs.agg({"n_chars": "sum"}).first()[0]
    )
    # reruns produce the identical assignment (pure function of the data)
    manifest2 = write_training_shards(
        docs, str(tmp_path / "shards2"), "cast(doc_id as string)",
        shard_rows=64, token_col="n_chars",
    ).collect()
    assert [tuple(r) for r in manifest] == [tuple(r) for r in manifest2]
