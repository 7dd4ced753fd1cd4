"""CSV ingest, dated paths, and partitioned-writer round trips (S1/S2/S8-S10)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.sources import io as sio
from star_schema_etl_airflow_spark.sources.schema import build_struct_type

ORDER_COLS = [
    {"name": "order_id", "type": "STRING"},
    {"name": "amount", "type": "FLOAT"},
    {"name": "order_date", "type": "DATE"},
]


def test_resolve_dated_path():
    assert (
        sio.resolve_dated_path("sales/orders/*.csv", "2024-01-15")
        == "sales/orders/20240115/orders_20240115.csv"
    )
    assert (
        sio.resolve_dated_path("x/{ds_nodash}/f_{ds}.csv", "2024-01-15")
        == "x/20240115/f_2024-01-15.csv"
    )


def test_csv_ingest_with_schema_and_stamp(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("order_id,amount,order_date\no1,10.5,2024-01-01\no2,7.25,2024-01-02\n")
    schema = build_struct_type(ORDER_COLS)
    df = sio.read_csv(spark, str(p), schema)
    rows = df.collect()
    assert {r.order_id for r in rows} == {"o1", "o2"}
    assert all(r.ingestion_timestamp is not None for r in rows)
    assert [f.name for f in schema.fields] == ["order_id", "amount", "order_date"]
    assert dict(df.dtypes)["amount"] == "double"
    assert dict(df.dtypes)["order_date"] == "date"


def test_csv_tolerant_drops_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "order_id,amount,order_date\n"
        "o1,10.5,2024-01-01\n"
        "o2,NOT_A_NUMBER,2024-01-02\n"   # malformed double
        "o3,3.5,2024-01-03\n"
    )
    schema = build_struct_type(ORDER_COLS)
    df = sio.read_csv(spark, str(p), schema, tolerant=True)
    assert {r.order_id for r in df.collect()} == {"o1", "o3"}


def test_jsonl_ingest_with_schema_and_stamp(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"order_id": "o1", "amount": 10.5, "order_date": "2024-01-01"}\n'
        '{"order_id": "o2", "amount": 7.25, "order_date": "2024-01-02"}\n'
    )
    schema = build_struct_type(ORDER_COLS)
    df = sio.read_jsonl(spark, str(p), schema)
    rows = df.collect()
    assert {r.order_id for r in rows} == {"o1", "o2"}
    assert all(r.ingestion_timestamp is not None for r in rows)
    assert dict(df.dtypes)["amount"] == "double"
    assert dict(df.dtypes)["order_date"] == "date"


def test_jsonl_tolerant_drops_malformed(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"order_id": "o1", "amount": 10.5, "order_date": "2024-01-01"}\n'
        "this line is not json at all\n"
        '{"order_id": "o3", "amount": 3.5, "order_date": "2024-01-03"}\n'
    )
    schema = build_struct_type(ORDER_COLS)
    df = sio.read_jsonl(spark, str(p), schema, tolerant=True)
    assert {r.order_id for r in df.collect()} == {"o1", "o3"}


def test_sorted_parquet_files_cover_disjoint_ranges(spark, tmp_path):
    out = str(tmp_path / "sorted")
    df = spark.range(0, 10_000).withColumn(
        "k", (F.col("id") * 2654435761) % 10_000  # scrambled insert order
    )
    sio.write_sorted_parquet(df.select("k"), out, "k", n_files=4)
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    assert len(per_file) == 4
    ranges = sorted((r.lo, r.hi) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next  # disjoint ⇒ min/max stats prune scans


def test_partition_overwrite_refreshes_only_touched_partition(spark, tmp_path):
    out = str(tmp_path / "t")
    d1 = spark.createDataFrame(
        [("2024-01-01", 1.0), ("2024-01-02", 2.0)], "dt string, v double"
    ).withColumn("dt", F.to_date("dt"))
    sio.write_append(d1, out, partition_by="dt")

    # refresh only 01-02 with a new value (S8 semantics)
    d2 = spark.createDataFrame([("2024-01-02", 99.0)], "dt string, v double") \
        .withColumn("dt", F.to_date("dt"))
    sio.write_partition_overwrite(d2, out, "dt")

    got = {str(r.dt): r.v for r in spark.read.parquet(out).collect()}
    assert got == {"2024-01-01": 1.0, "2024-01-02": 99.0}


def test_write_swap_breaks_self_read_cycle(spark, tmp_path):
    out = str(tmp_path / "t2")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    sio.write_full_overwrite(base, out)
    # read-modify-write: new df's lineage reads `out`
    cur = spark.read.parquet(out)
    updated = cur.withColumn("s", F.upper("s"))
    sio.write_swap(updated, out)
    assert {r.s for r in spark.read.parquet(out).collect()} == {"A", "B"}
    assert not os.path.exists(out + "__tmp_swap")
