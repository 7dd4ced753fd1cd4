"""Streaming SCD2 maintenance must equal the batch day-by-day fold: three
daily delta files arrive (one per micro-batch, in mtime order), and the
final persisted dimension matches applying ``apply_scd2`` sequentially.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import types as T

from star_schema_etl_airflow_spark.operators.scd2 import apply_scd2
from star_schema_etl_airflow_spark.streaming.scd2_stream import (
    empty_dim,
    run_scd2_stream,
)

SRC_SCHEMA = T.StructType([
    T.StructField("customer_id", T.LongType()),
    T.StructField("email", T.StringType()),
    T.StructField("city", T.StringType()),
    T.StructField("run_date", T.StringType()),
])

DAYS = {
    "2024-01-01": [(1, "a@x.com", "nyc"), (2, "b@x.com", "sf")],
    "2024-01-02": [(1, "a@y.com", "nyc"), (3, "c@x.com", "la")],
    "2024-01-03": [(2, "b@x.com", "austin"), (3, "c@x.com", "la")],
}
TRACKED = ["email", "city"]


def test_streaming_scd2_matches_batch_fold(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, (d, rows) in enumerate(sorted(DAYS.items())):
        df = spark.createDataFrame(
            [(*r, d) for r in rows], SRC_SCHEMA
        )
        # the streaming file source lists FILES, not spark output dirs —
        # stage the single part-file into the landing dir
        staging = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in os.listdir(staging)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        fpath = os.path.join(landing, f"delta_{d}.parquet")
        os.rename(os.path.join(staging, part), fpath)
        # file-source ordering is by modification time — pin it
        t = time.time() - 100 + i
        os.utime(fpath, (t, t))

    streamed = run_scd2_stream(
        spark, landing, str(tmp_path / "dim"), SRC_SCHEMA,
        key="customer_id", tracked=TRACKED,
    )

    expected = empty_dim(spark, SRC_SCHEMA, "customer_id", TRACKED)
    for d, rows in sorted(DAYS.items()):
        day = spark.createDataFrame(rows, SRC_SCHEMA[:3])
        expected = apply_scd2(expected, day, "customer_id", TRACKED, d, "sk")

    s = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in expected.collect())
    assert s == b
    # invariants: exactly one current row per key; versioned history exists
    cur = streamed.filter("is_current").groupBy("customer_id").count().collect()
    assert all(r["count"] == 1 for r in cur)
    assert streamed.count() > streamed.filter("is_current").count()


def _stage_delta(spark, tmp_path, landing, d, rows, seq):
    """Write one day's delta as a single part-file in the landing dir
    with a pinned mtime (the file source orders by modification time)."""
    df = spark.createDataFrame([(*r, d) for r in rows], SRC_SCHEMA)
    staging = str(tmp_path / f"stage_{seq}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging)
                if f.startswith("part-") and f.endswith(".parquet"))
    fpath = os.path.join(landing, f"delta_{d}_{seq}.parquet")
    os.rename(os.path.join(staging, part), fpath)
    t = time.time() - 100 + seq
    os.utime(fpath, (t, t))


def test_late_arriving_date_inserts_new_keys_dead_letters_rest(
    spark, tmp_path
):
    """ADVICE r10 (medium): a genuinely late file — a run_date older
    than already-folded days that the stream has never applied — must
    not vanish.  New-key rows fold in (there is no history for them to
    contradict); rows for already-versioned keys are dead-lettered with
    their run_date, never silently dropped and never allowed to rewrite
    committed history."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    _stage_delta(spark, tmp_path, landing, "2024-01-01",
                 [(1, "a@x.com", "nyc")], 0)
    _stage_delta(spark, tmp_path, landing, "2024-01-03",
                 [(1, "a@y.com", "nyc")], 1)
    dim_path = str(tmp_path / "dim")
    first = run_scd2_stream(
        spark, landing, dim_path, SRC_SCHEMA,
        key="customer_id", tracked=TRACKED,
    )
    before = sorted(tuple(r) for r in first.collect())
    assert len(before) == 2  # key 1: expired 01-01 version + current

    # late backfill copy: run_date 01-02 with a brand-new key 9 and a
    # conflicting row for key 1 (whose history already covers 01-02)
    _stage_delta(spark, tmp_path, landing, "2024-01-02",
                 [(9, "z@x.com", "akl"), (1, "STALE@x.com", "nyc")], 2)
    dim = run_scd2_stream(
        spark, landing, dim_path, SRC_SCHEMA,
        key="customer_id", tracked=TRACKED,
    )

    # new key 9 landed, effective at the LATE date
    nine = dim.filter("customer_id = 9").collect()
    assert len(nine) == 1
    assert str(nine[0]["effective_date"]) == "2024-01-02"
    assert nine[0]["is_current"]
    # key 1's history is untouched by the stale row
    ones = sorted(tuple(r) for r in dim.filter("customer_id = 1").collect())
    assert ones == [t for t in before if t[1] == 1]
    # the stale row is in the dead letter, not lost
    dl = spark.read.parquet(dim_path + "__dead_letter")
    rows = dl.collect()
    assert len(rows) == 1
    assert rows[0]["customer_id"] == 1
    assert rows[0]["email"] == "STALE@x.com"
    assert rows[0]["run_date"] == "2024-01-02"


def test_dead_letter_replay_does_not_duplicate(spark, tmp_path):
    """r11 ADVICE: the dead-letter append commits BEFORE the swap, so a
    crash between them replays the late date with its stale rows already
    dead-lettered.  The replay must dedupe on (run_date, key) — the dead
    letter holds exactly one copy — and still fold the fresh keys."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    _stage_delta(spark, tmp_path, landing, "2024-01-01",
                 [(1, "a@x.com", "nyc")], 0)
    _stage_delta(spark, tmp_path, landing, "2024-01-03",
                 [(1, "a@y.com", "nyc")], 1)
    dim_path = str(tmp_path / "dim")
    run_scd2_stream(spark, landing, dim_path, SRC_SCHEMA,
                    key="customer_id", tracked=TRACKED)

    # the "crashed run": its dead-letter append for the late 01-02 date
    # landed, but the swap (and therefore the ledger) did not
    dl = dim_path + "__dead_letter"
    spark.createDataFrame(
        [(1, "STALE@x.com", "nyc", "2024-01-02")], SRC_SCHEMA
    ).write.mode("append").parquet(dl)

    # restart delivers the late file; its stale row is already in the DL
    _stage_delta(spark, tmp_path, landing, "2024-01-02",
                 [(9, "z@x.com", "akl"), (1, "STALE@x.com", "nyc")], 2)
    dim = run_scd2_stream(spark, landing, dim_path, SRC_SCHEMA,
                          key="customer_id", tracked=TRACKED)

    rows = spark.read.parquet(dl).collect()
    assert len(rows) == 1, "replayed late date duplicated dead-letter rows"
    assert rows[0]["customer_id"] == 1
    assert rows[0]["run_date"] == "2024-01-02"
    # and the fresh key still folded in
    nine = dim.filter("customer_id = 9").collect()
    assert len(nine) == 1 and str(nine[0]["effective_date"]) == "2024-01-02"


def test_ledger_swaps_atomically_and_legacy_sidecar_migrates(
    spark, tmp_path
):
    """The applied-dates ledger lives INSIDE the dimension directory
    (one rename publishes both — no swap/ledger crash window), is
    invisible to parquet readers, and a legacy sidecar ledger is read
    once and migrated on the next fold."""
    import json
    import shutil

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    _stage_delta(spark, tmp_path, landing, "2024-01-01",
                 [(1, "a@x.com", "nyc")], 0)
    dim_path = str(tmp_path / "dim")
    run_scd2_stream(spark, landing, dim_path, SRC_SCHEMA,
                    key="customer_id", tracked=TRACKED)
    in_dir = os.path.join(dim_path, "_applied_dates.json")
    sidecar = dim_path + "__applied_dates.json"
    assert os.path.exists(in_dir)
    assert not os.path.exists(sidecar)
    with open(in_dir) as f:
        assert json.load(f) == ["2024-01-01"]
    # the underscore file is invisible to the parquet reader
    assert spark.read.parquet(dim_path).count() == 1

    # simulate the pre-in-dir layout: ledger as sidecar only
    shutil.move(in_dir, sidecar)
    spark.catalog.refreshByPath(dim_path)
    _stage_delta(spark, tmp_path, landing, "2024-01-02",
                 [(1, "a@x.com", "sf")], 1)
    # wipe the checkpoint: both files re-deliver; 01-01 must be skipped
    # on the strength of the LEGACY ledger alone
    shutil.rmtree(dim_path + "__ckpt", ignore_errors=True)
    dim = run_scd2_stream(spark, landing, dim_path, SRC_SCHEMA,
                          key="customer_id", tracked=TRACKED)
    assert dim.count() == 2  # one fold of each day, no double-apply
    with open(os.path.join(dim_path, "_applied_dates.json")) as f:
        assert json.load(f) == ["2024-01-01", "2024-01-02"]
    assert not os.path.exists(sidecar), "legacy sidecar not migrated"


def test_drain_timeout_raises_not_partial_silence(spark, tmp_path):
    """Verdict r10 task 3: a drain that exceeds the bound must RAISE —
    returning normally with the landing dir partially folded was the
    old ``awaitTermination(300)`` failure mode."""
    import pytest

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    # 6 single-file micro-batches, each a full read-fold-swap cycle —
    # far more than 0.5s of work on any host
    for i in range(6):
        _stage_delta(spark, tmp_path, landing, f"2024-02-{i + 1:02d}",
                     [(1, f"v{i}@x.com", "nyc")], i)
    with pytest.raises(TimeoutError, match="partially folded"):
        run_scd2_stream(
            spark, landing, str(tmp_path / "dim"), SRC_SCHEMA,
            key="customer_id", tracked=TRACKED, timeout=0.5,
        )
    # and the resume finishes the job exactly
    dim = run_scd2_stream(
        spark, landing, str(tmp_path / "dim"), SRC_SCHEMA,
        key="customer_id", tracked=TRACKED,
    )
    cur = dim.filter("is_current").collect()
    assert len(cur) == 1 and cur[0]["email"] == "v5@x.com"
    assert dim.count() == 6


def test_rebuild_applies_dead_lettered_dates_chronologically(
    spark, tmp_path
):
    """The dead-letter's escape hatch: rebuild_dimension re-folds the
    whole landing history in run_date order, so a previously
    dead-lettered late update lands in its correct historical position
    — the final dimension equals the one a fully in-order arrival
    would have produced — and the dead letter is cleared."""
    from star_schema_etl_airflow_spark.streaming.scd2_stream import (
        rebuild_dimension,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    _stage_delta(spark, tmp_path, landing, "2024-01-01",
                 [(1, "a@x.com", "nyc")], 0)
    _stage_delta(spark, tmp_path, landing, "2024-01-03",
                 [(1, "a@y.com", "nyc")], 1)
    dim_path = str(tmp_path / "dim")
    run_scd2_stream(spark, landing, dim_path, SRC_SCHEMA,
                    key="customer_id", tracked=TRACKED)
    # late file: an update for key 1 dated BETWEEN the folded days —
    # the stream dead-letters it (pinned above); now rebuild
    _stage_delta(spark, tmp_path, landing, "2024-01-02",
                 [(1, "a@x.com", "sf")], 2)
    run_scd2_stream(spark, landing, dim_path, SRC_SCHEMA,
                    key="customer_id", tracked=TRACKED)
    assert spark.read.parquet(dim_path + "__dead_letter").count() == 1

    rebuilt = rebuild_dimension(
        spark, landing, dim_path, SRC_SCHEMA,
        key="customer_id", tracked=TRACKED)

    # equals the fully in-order fold
    expected = empty_dim(spark, SRC_SCHEMA, "customer_id", TRACKED)
    for d, rows in (("2024-01-01", [(1, "a@x.com", "nyc")]),
                    ("2024-01-02", [(1, "a@x.com", "sf")]),
                    ("2024-01-03", [(1, "a@y.com", "nyc")])):
        day = spark.createDataFrame(rows, SRC_SCHEMA[:3])
        expected = apply_scd2(expected, day, "customer_id", TRACKED, d, "sk")
    assert (sorted(tuple(r) for r in rebuilt.collect())
            == sorted(tuple(r) for r in expected.collect()))
    assert rebuilt.count() == 3  # all three versions in history
    assert not os.path.exists(dim_path + "__dead_letter")
    # and the stream resumes cleanly on top of the rebuilt ledger:
    # nothing new to apply, dimension unchanged
    again = run_scd2_stream(spark, landing, dim_path, SRC_SCHEMA,
                            key="customer_id", tracked=TRACKED)
    assert (sorted(tuple(r) for r in again.collect())
            == sorted(tuple(r) for r in rebuilt.collect()))


def test_replayed_batch_refolds_idempotently(spark, tmp_path):
    """Exactly-once audit (r9 verdict task 8): foreachBatch offers
    at-least-once — if the process dies AFTER write_swap commits but
    BEFORE the checkpoint records the batch, restart re-delivers the
    same batch against the already-folded dimension.  The fold must be
    idempotent: re-applying a day whose changes are already in the
    dimension detects zero changes (null-safe tracked-attr comparison),
    assigns zero new surrogate keys, and leaves the persisted dimension
    byte-identical — the same invariant the batch SCD2 pins."""
    import glob

    from pyspark.sql import functions as F
    from star_schema_etl_airflow_spark.sources.io import write_swap

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, (d, rows) in enumerate(sorted(DAYS.items())):
        df = spark.createDataFrame([(*r, d) for r in rows], SRC_SCHEMA)
        staging = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging)
                    if f.startswith("part-") and f.endswith(".parquet"))
        fpath = os.path.join(landing, f"delta_{d}.parquet")
        os.rename(os.path.join(staging, part), fpath)
        t = time.time() - 100 + i
        os.utime(fpath, (t, t))

    dim_path = str(tmp_path / "dim")
    first = run_scd2_stream(
        spark, landing, dim_path, SRC_SCHEMA,
        key="customer_id", tracked=TRACKED,
    )
    folded = sorted(tuple(r) for r in first.collect())

    # Simulate the crash-window replay: the LAST batch (the 01-03 delta)
    # is re-delivered against the committed dimension — exactly what a
    # restart does when the swap landed but the checkpoint write didn't.
    replay_day = sorted(DAYS)[-1]
    batch_df = spark.read.schema(SRC_SCHEMA).parquet(
        os.path.join(landing, f"delta_{replay_day}.parquet"))
    dim = spark.read.parquet(dim_path)
    day = batch_df.filter(F.col("run_date") == replay_day).drop("run_date")
    refolded = apply_scd2(dim, day, "customer_id", TRACKED, replay_day, "sk")
    write_swap(refolded, dim_path)

    after = sorted(
        tuple(r) for r in spark.read.parquet(dim_path).collect())
    assert after == folded, "replayed batch changed the dimension"

    # and a full second replay of EVERY batch (worst-case restart with a
    # wiped checkpoint) is equally a no-op
    import shutil
    for p in glob.glob(dim_path.rstrip("/") + "__ckpt*"):
        shutil.rmtree(p, ignore_errors=True)
    second = run_scd2_stream(
        spark, landing, dim_path, SRC_SCHEMA,
        key="customer_id", tracked=TRACKED,
    )
    assert sorted(tuple(r) for r in second.collect()) == folded
