"""Round-5 regression pins: dedupe_latest tie determinism, symmetric
date/datetime skip-pruning, scoped RocksDB state-store conf, corrupt-
corpus fail-fast in the dedup stream, truncated-PCM decode_err rows."""

from __future__ import annotations

import datetime
import os
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- scd2 ties

def test_dedupe_latest_deterministic_under_ties(spark):
    """Two same-key rows with IDENTICAL order_col must resolve to the
    same winner under any input partitioning/ordering — the tie-break is
    a content hash, not partition luck (round-4 verdict finding #1)."""
    from star_schema_etl_airflow_spark.operators.scd2 import dedupe_latest

    rows = [
        ("c1", "Oslo", "a@x.com", 5),
        ("c1", "Bonn", "b@x.com", 5),   # tie on v with different attrs
        ("c1", "OLD!", "a@x.com", 1),
        ("c2", "Lima", None, 3),
        ("c2", "Lima", "z@x.com", 3),   # NULL-vs-value tie
        ("c3", "Kiev", "c@x.com", 2),
        ("c3", "Kiev", "c@x.com", 2),   # full-duplicate tie
    ]
    schema = "cid string, city string, email string, v int"
    base = spark.createDataFrame(rows, schema)

    variants = [
        base,
        base.repartition(1),
        base.repartition(7, "cid"),
        base.repartition(5, "email"),
        spark.createDataFrame(list(reversed(rows)), schema),
        spark.createDataFrame(rows[3:] + rows[:3], schema).repartition(3),
    ]
    results = [
        sorted(map(tuple, dedupe_latest(v, "cid", "v").collect()))
        for v in variants
    ]
    for r in results[1:]:
        assert r == results[0]
    # one row per key, and ties actually resolved (not dropped/doubled)
    assert [row[0] for row in results[0]] == ["c1", "c2", "c3"]
    assert all(row[3] in (5, 3, 2) for row in results[0])


def test_apply_scd2_stable_under_tied_duplicates(spark):
    """End-to-end: an SCD2 apply whose slice contains equal-timestamp
    same-key duplicates yields byte-identical dimensions across
    repartitionings of the slice."""
    from star_schema_etl_airflow_spark.operators.scd2 import apply_scd2

    dim = spark.createDataFrame(
        [(1, "a", "x", datetime.date(2024, 1, 1), None, True)],
        T.StructType([
            T.StructField("sk", T.LongType()),
            T.StructField("bk", T.StringType()),
            T.StructField("attr", T.StringType()),
            T.StructField("effective_date", T.DateType()),
            T.StructField("expiration_date", T.DateType()),
            T.StructField("is_current", T.BooleanType()),
        ]),
    )
    rows = [("a", "x1", 9), ("a", "x2", 9), ("b", "y1", 9), ("b", "y2", 9)]
    schema = "bk string, attr string, v int"
    kw = dict(key="bk", tracked=["attr"], run_date="2024-02-01",
              sk_col="sk", order_col="v")
    out1 = apply_scd2(dim, spark.createDataFrame(rows, schema), **kw)
    out2 = apply_scd2(
        dim,
        spark.createDataFrame(list(reversed(rows)), schema).repartition(6),
        **kw,
    )
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


# ----------------------------------------------------------- skip pruning

def _ranges(**stats):
    from star_schema_etl_airflow_spark.operators.skipping import FileRange

    return [
        FileRange(path, lo, hi, False) for path, (lo, hi) in stats.items()
    ]


def test_prune_files_datetime_bounds_vs_date_stats():
    """Datetime predicate bounds against a date-stats manifest must prune
    (SQL promotes the date side to midnight timestamps), not raise
    TypeError (ADVICE round-4 finding)."""
    from star_schema_etl_airflow_spark.operators.skipping import prune_files

    d = datetime.date
    manifest = _ranges(
        old=(d(2024, 1, 1), d(2024, 1, 31)),
        mid=(d(2024, 2, 1), d(2024, 2, 28)),
        new=(d(2024, 3, 1), d(2024, 3, 31)),
    )
    lo = datetime.datetime(2024, 2, 10, 12, 0, 0)
    hi = datetime.datetime(2024, 2, 20, 6, 30, 0)
    assert prune_files(manifest, lo, hi) == ["mid"]
    # boundary: a datetime at exactly midnight of a file's hi date matches
    assert prune_files(
        manifest, datetime.datetime(2024, 1, 31), datetime.datetime(2024, 1, 31)
    ) == ["old"]


def test_prune_files_date_bounds_vs_datetime_stats_still_works():
    from star_schema_etl_airflow_spark.operators.skipping import prune_files

    dt = datetime.datetime
    manifest = _ranges(
        a=(dt(2024, 1, 1, 5), dt(2024, 1, 31, 18)),
        b=(dt(2024, 2, 1, 0), dt(2024, 2, 28, 23)),
    )
    keep = prune_files(manifest, datetime.date(2024, 2, 5), datetime.date(2024, 2, 6))
    assert keep == ["b"]


# ------------------------------------------------- scoped state-store conf

def test_rocksdb_state_store_scopes_and_restores(spark):
    from star_schema_etl_airflow_spark.streaming.stateful2 import (
        _PROVIDER_KEY,
        _ROCKSDB_PROVIDER,
        rocksdb_state_store,
    )

    # prior value set → restored
    spark.conf.set(_PROVIDER_KEY, "com.example.PriorProvider")
    with rocksdb_state_store(spark):
        assert spark.conf.get(_PROVIDER_KEY) == _ROCKSDB_PROVIDER
    assert spark.conf.get(_PROVIDER_KEY) == "com.example.PriorProvider"

    # no prior value → unset on exit (falls back to Spark's default)
    spark.conf.unset(_PROVIDER_KEY)
    with rocksdb_state_store(spark):
        assert spark.conf.get(_PROVIDER_KEY) == _ROCKSDB_PROVIDER
    assert spark.conf.get(_PROVIDER_KEY) != _ROCKSDB_PROVIDER

    # restored even when the body raises
    spark.conf.set(_PROVIDER_KEY, "com.example.PriorProvider")
    with pytest.raises(RuntimeError):
        with rocksdb_state_store(spark):
            raise RuntimeError("boom")
    assert spark.conf.get(_PROVIDER_KEY) == "com.example.PriorProvider"
    spark.conf.unset(_PROVIDER_KEY)


# --------------------------------------------- dedup stream corrupt corpus

def test_dedup_stream_fails_fast_on_corrupt_corpus(spark, tmp_path):
    """A corpus path that EXISTS but cannot be read must fail the
    micro-batch (checkpoint retries), never be treated as day-0-empty —
    that would append the batch undeduped and permanently admit
    duplicates (ADVICE round-4, dedup_stream.py)."""
    from star_schema_etl_airflow_spark.streaming.dedup_stream import (
        run_dedup_stream,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    staging = str(tmp_path / "stage")
    spark.createDataFrame(
        [(1, "alpha")], schema
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.rename(os.path.join(staging, part), os.path.join(landing, "b0.parquet"))

    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    (corpus_dir / "part-00000.parquet").write_bytes(b"this is not parquet")

    with pytest.raises(Exception) as exc_info:
        run_dedup_stream(spark, landing, str(corpus_dir), schema)
    # the failure must be the read error surfacing, and nothing may have
    # been appended to the corrupt corpus
    assert "day 0" not in str(exc_info.value)
    assert sorted(os.listdir(corpus_dir)) == ["part-00000.parquet"]


def test_dedup_stream_day0_missing_corpus_still_bootstraps(spark, tmp_path):
    from star_schema_etl_airflow_spark.streaming.dedup_stream import (
        run_dedup_stream,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    staging = str(tmp_path / "stage")
    spark.createDataFrame(
        [(1, "alpha"), (2, "alpha")], schema
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.rename(os.path.join(staging, part), os.path.join(landing, "b0.parquet"))

    final = run_dedup_stream(spark, landing, str(tmp_path / "corpus"), schema)
    assert [(r.doc_id, r.text) for r in final.collect()] == [(1, "alpha")]


# ------------------------------------------------------ truncated PCM WAV

def _make_wav_16bit_mono(n_frames=64, sample_rate=8000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            b"".join(struct.pack("<h", (i * 997) % 4096) for i in range(n_frames))
        )
    return buf.getvalue()


def test_audio_features_truncated_pcm_yields_decode_err_row(spark):
    """A WAV whose data chunk is cut mid-frame must surface as a
    decode_err row (the decode_stats contract), not a struct.error task
    failure (ADVICE round-4, multimodal.py)."""
    from star_schema_etl_airflow_spark.sources.multimodal import audio_features

    good = _make_wav_16bit_mono()
    truncated = good[:-1]  # odd byte count → partial 16-bit sample
    media = spark.createDataFrame(
        [(1, "audio", bytearray(good)), (2, "audio", bytearray(truncated))],
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    rows = {r.media_id: r for r in audio_features(media).collect()}
    assert rows[1].decode_err is None
    assert rows[1].n_samples == 64
    assert rows[2].decode_err is not None
    assert rows[2].sample_rate is None


# ------------------------------------- surrogate-key promotion at scale

def test_surrogate_key_promotion_engages_at_real_scale(spark, tmp_path):
    """Round-4 verdict task 8: drive apply_scd2's AUTO path with a slice
    whose on-disk size genuinely exceeds DISTRIBUTED_SK_BYTES (no
    monkeypatched threshold) and assert (a) the promoted plan engages —
    no single-partition exchange — and (b) the keys equal the global
    `row_number() over (order by key)` definition."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.operators.scd2 import (
        DISTRIBUTED_SK_BYTES,
        _estimated_bytes,
        apply_scd2,
    )

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_docs = docs.count()
    n_reps = 170
    reps = spark.range(n_reps).select(F.col("id").alias("rep"))
    big_path = str(tmp_path / "big_slice")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * 1000 + F.col("rep")).alias("bk"),
            # distinct per replica: identical strings would dictionary-
            # encode the replicated corpus back under the threshold
            F.concat_ws(
                ":",
                F.sha2(F.concat_ws("|", "doc_id", "rep"), 256),
                F.col("text"),
            ).alias("attr"),
        )
        .write.parquet(big_path)
    )
    source = spark.read.parquet(big_path)

    # the probe must see the real file size clear the threshold
    assert _estimated_bytes(source) > DISTRIBUTED_SK_BYTES

    dim = spark.createDataFrame(
        [],
        "sk long, bk long, attr string, effective_date date, "
        "expiration_date date, is_current boolean",
    )
    out = apply_scd2(
        dim, source, key="bk", tracked=["attr"], run_date="2024-06-01",
        sk_col="sk",
    )  # distributed_keys=None → auto-promotion decides
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    rows = out.select("bk", "sk").collect()
    assert len(rows) == n_docs * n_reps
    expected = {bk: i + 1 for i, bk in enumerate(sorted(r.bk for r in rows))}
    mismatches = sum(1 for r in rows if r.sk != expected[r.bk])
    assert mismatches == 0
