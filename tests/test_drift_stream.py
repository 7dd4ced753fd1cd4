"""Streaming drift monitor (streaming/drift_stream.py): the folded
delta counts must equal the batch groupBy of everything ingested under
any batching, re-delivery must not double-count, and the PSI computed
from the streamed state must be bit-identical to the batch monitor's
on the same split."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.plans.corpus_drift import (
    corpus_drift_psi,
)
from star_schema_etl_airflow_spark.streaming.drift_stream import (
    merge_counts,
    psi_against,
    run_drift_stream,
)

SF_DIR = "/root/testdata/sf0.001"
SRC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("lang", T.StringType()),
])


def _stage_odd_half_in_batches(spark, tmp_path, n_batches=3):
    """The fixture's odd-doc_id half (the batch monitor's delta) split
    into n landing files by doc_id residue."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang")
        .filter(F.col("doc_id") % 2 == 1)
    )
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i in range(n_batches):
        staging = str(tmp_path / f"stage_{i}")
        docs.filter((F.col("doc_id") % (2 * n_batches)) == 2 * i + 1) \
            .coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in os.listdir(staging)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.rename(os.path.join(staging, part),
                  os.path.join(landing, f"batch_{i}.parquet"))
    return docs, landing


def test_streamed_psi_equals_batch_monitor(spark, tmp_path):
    docs, landing = _stage_odd_half_in_batches(spark, tmp_path)
    state = run_drift_stream(
        spark, landing, str(tmp_path / "state"), SRC_SCHEMA
    )
    # folded counts == direct groupBy of everything ingested
    want = {
        (r.lang, r.n)
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r.lang, r.n) for r in state.collect()}
    assert got == want
    # PSI from the streamed state == the batch monitor, bit-identical
    at_counts = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    )
    stream_psi = {
        tuple(r) for r in psi_against(at_counts, state).collect()
    }
    batch_psi = {tuple(r) for r in corpus_drift_psi(spark, SF_DIR).collect()}
    assert stream_psi == batch_psi


def test_redelivered_batch_is_not_double_counted(spark):
    b0 = spark.createDataFrame([("en", 5), ("fr", 2)], "lang string, n long")
    s1 = merge_counts(None, b0, batch_id=0)
    s2 = merge_counts(s1, b0, batch_id=0)       # re-delivery → skipped
    assert s2 is None
    b1 = spark.createDataFrame([("en", 3)], "lang string, n long")
    s3 = merge_counts(s1, b1, batch_id=1)
    got = {(r.lang, r.n) for r in s3.collect()}
    assert got == {("en", 8), ("fr", 2)}


def test_lost_checkpoint_against_surviving_state_raises(spark):
    """batch_id below the state's high-water mark means the checkpoint
    was lost/rebuilt (ids restarted at 0) against a surviving state
    table — folding would silently skip real batches, so it must raise."""
    import pytest

    b0 = spark.createDataFrame([("en", 5)], "lang string, n long")
    s1 = merge_counts(None, b0, batch_id=3)
    with pytest.raises(ValueError, match="high-water"):
        merge_counts(s1, b0, batch_id=0)


def test_rebuilt_checkpoint_at_same_hwm_raises_on_run_id(spark):
    """ADVICE r14: a rebuilt checkpoint restarting at batch 0 against a
    surviving state whose high-water mark is ALSO 0 is indistinguishable
    from re-delivery by batch id alone — the persisted stream run id
    disambiguates: same run skips, different run raises."""
    import pytest

    b0 = spark.createDataFrame([("en", 5)], "lang string, n long")
    s1 = merge_counts(None, b0, batch_id=0, run_id="run-A")
    # genuine re-delivery (same run id, same batch) → skip
    assert merge_counts(s1, b0, batch_id=0, run_id="run-A") is None
    # rebuilt checkpoint (fresh run id, batch restarts at hwm 0) → raise
    with pytest.raises(ValueError, match="rebuilt"):
        merge_counts(s1, b0, batch_id=0, run_id="run-B")


def test_pre_upgrade_state_without_run_id_keeps_legacy_skip(spark):
    """State tables written before the run_id column existed must keep
    folding: unknown stored run degrades to batch-id-only discipline."""
    legacy = spark.createDataFrame(
        [("en", 5, 0)], "lang string, n long, max_batch long")
    b0 = spark.createDataFrame([("en", 5)], "lang string, n long")
    assert merge_counts(legacy, b0, batch_id=0, run_id="run-B") is None
    s2 = merge_counts(legacy, b0, batch_id=1, run_id="run-B")
    got = {(r.lang, r.n, r.run_id) for r in s2.collect()}
    assert got == {("en", 10, "run-B")}


def test_empty_landing_dir_yields_empty_state(spark, tmp_path):
    """Zero micro-batches published: the drain must return an empty
    counts relation with the state schema, not throw on a missing
    parquet path."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    state = run_drift_stream(
        spark, landing, str(tmp_path / "state"), SRC_SCHEMA
    )
    assert state.count() == 0
    assert [f.name for f in state.schema.fields] == [
        "lang", "n", "max_batch", "run_id"
    ]


def test_onesided_language_kept_by_full_outer_psi(spark):
    """A language present on only one side must appear in the streamed
    PSI with a zero-filled bucket and a finite smoothed term — matching
    the batch monitor, which keeps zero-count buckets in its single
    groupBy."""
    from star_schema_etl_airflow_spark.plans.corpus_drift import psi_terms

    at = spark.createDataFrame(
        [("en", 90), ("fr", 10)], "lang string, n long")
    streamed = spark.createDataFrame(
        [("en", 50), ("de", 50)], "lang string, n long")
    got = {r.lang: r for r in psi_against(at, streamed).collect()}
    # all three languages present; one-sided buckets zero-filled
    assert set(got) == {"en", "fr", "de"}
    assert (got["fr"].n_at, got["fr"].n_delta) == (10, 0)
    assert (got["de"].n_at, got["de"].n_delta) == (0, 50)
    # smoothed terms are finite and positive (drift contributions),
    # never NULL or a saturated long cast
    for lang in ("fr", "de"):
        assert got[lang].psi_term is not None
        assert got[lang].psi_term > 0
        assert abs(got[lang].ln_ratio_micro) < 100 * 1_000_000
    # shares use full totals (100 at-rest, 100 streamed), not the
    # inner-join subset
    assert got["en"].p_at == 0.9 and got["en"].q_delta == 0.5


def test_streamed_ks_equals_batch_monitor(spark, tmp_path):
    """The KS twin: fold the odd-half documents' n_chars counts through
    the generalized stream, compute KS vs the at-rest snapshot — must
    be bit-identical to the batch corpus_drift_ks."""
    from star_schema_etl_airflow_spark.plans.corpus_drift import (
        corpus_drift_ks,
    )
    from star_schema_etl_airflow_spark.streaming.drift_stream import (
        ks_against,
    )

    ks_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_chars", T.LongType()),
    ])
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .filter(F.col("doc_id") % 2 == 1)
    )
    landing = str(tmp_path / "landing_ks")
    os.makedirs(landing)
    for i in range(3):
        staging = str(tmp_path / f"stage_ks_{i}")
        docs.filter((F.col("doc_id") % 6) == 2 * i + 1) \
            .coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in os.listdir(staging)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.rename(os.path.join(staging, part),
                  os.path.join(landing, f"batch_{i}.parquet"))
    state = run_drift_stream(
        spark, landing, str(tmp_path / "state_ks"), ks_schema,
        key_col="n_chars",
    )
    at_counts = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 0)
        .groupBy("n_chars").agg(F.count(F.lit(1)).alias("n"))
    )
    stream_row = ks_against(at_counts, state).collect()[0]
    batch_row = corpus_drift_ks(spark, SF_DIR).collect()[0]
    assert tuple(stream_row) == tuple(batch_row)
