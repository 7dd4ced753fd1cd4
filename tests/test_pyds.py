"""The custom Python DataSource (sources/pyds.py): schema, partition
fan-out, determinism under re-partitioning, and option handling."""

from __future__ import annotations

from star_schema_etl_airflow_spark.sources.pyds import (
    _row,
    register_synthetic_events,
)


def _read(spark, rows, parts):
    register_synthetic_events(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
    )


def test_schema_count_and_partition_fanout(spark):
    df = _read(spark, 100, 5)
    assert [f.name for f in df.schema.fields] == [
        "event_id", "user_id", "event_type", "value"
    ]
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100


def test_rows_match_pure_function_and_any_partitioning(spark):
    a = {tuple(r) for r in _read(spark, 64, 2).collect()}
    b = {tuple(r) for r in _read(spark, 64, 7).collect()}
    expected = {_row(i) for i in range(64)}
    assert a == expected
    assert b == expected


def test_uneven_partition_bounds_cover_exactly(spark):
    # 10 rows over 4 partitions → bounds 0-2,2-5,5-7,7-10; no gap/overlap
    ids = sorted(r["event_id"] for r in _read(spark, 10, 4).collect())
    assert ids == list(range(10))


def test_stream_reader_reads_all_rows_exactly_once(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    register_synthetic_events(spark)
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows", 120)
        .option("partitions", 3)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == {_row(i) for i in range(120)}


def test_stream_resumes_from_checkpointed_offset(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    register_synthetic_events(spark)

    def run(rows):
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows", rows)
            .option("partitions", 2)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(60)
    assert spark.read.parquet(out).count() == 60
    # restart with a larger horizon and the SAME checkpoint: only the
    # unread tail [60, 100) may be emitted — no duplicates of 0-59
    run(100)
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(100))
