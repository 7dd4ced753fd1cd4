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


def test_csv_field_delimiter_maps_to_sep(spark, tmp_path):
    p = tmp_path / "pipe.csv"
    p.write_text("order_id|amount|order_date\no1|10.5|2024-01-01\n")
    schema = build_struct_type(ORDER_COLS)
    df = sio.read_csv(spark, str(p), schema, field_delimiter="|")
    rows = df.collect()
    assert len(rows) == 1 and rows[0].order_id == "o1"
    assert rows[0].amount == 10.5


def test_csv_skip_leading_rows_zero_reads_every_line(spark, tmp_path):
    # skip_leading_rows=0: there is no header — line 1 is data
    p = tmp_path / "nohdr.csv"
    p.write_text("o1,10.5,2024-01-01\no2,7.25,2024-01-02\n")
    schema = build_struct_type(ORDER_COLS)
    df = sio.read_csv(spark, str(p), schema, skip_leading_rows=0)
    assert {r.order_id for r in df.collect()} == {"o1", "o2"}


def test_csv_skip_leading_rows_one_skips_per_file(spark, tmp_path):
    # BigQuery skips N leading rows PER FILE; Spark header=true does the
    # same for N=1 — pin it across a two-file load
    d = tmp_path / "multi"
    d.mkdir()
    (d / "a.csv").write_text("order_id,amount,order_date\no1,1.0,2024-01-01\n")
    (d / "b.csv").write_text("order_id,amount,order_date\no2,2.0,2024-01-02\n")
    schema = build_struct_type(ORDER_COLS)
    df = sio.read_csv(spark, str(d), schema, skip_leading_rows=1)
    assert {r.order_id for r in df.collect()} == {"o1", "o2"}


def test_csv_skip_leading_rows_above_one_rejected(spark, tmp_path):
    import pytest

    schema = build_struct_type(ORDER_COLS)
    with pytest.raises(ValueError, match="skip_leading_rows"):
        sio.read_csv(spark, str(tmp_path), schema, skip_leading_rows=2)


def test_csv_allow_jagged_rows_null_fills_missing_trailing(spark, tmp_path):
    p = tmp_path / "jagged.csv"
    p.write_text(
        "order_id,amount,order_date\n"
        "o1,10.5,2024-01-01\n"
        "o2,7.25\n"          # missing trailing order_date
        "o3\n"               # missing two trailing columns
    )
    schema = build_struct_type(ORDER_COLS)
    df = sio.read_csv(spark, str(p), schema, allow_jagged_rows=True)
    rows = {r.order_id: r for r in df.collect()}
    assert set(rows) == {"o1", "o2", "o3"}
    assert rows["o2"].amount == 7.25 and rows["o2"].order_date is None
    assert rows["o3"].amount is None and rows["o3"].order_date is None


def test_csv_ignore_unknown_values_drops_extra_columns(spark, tmp_path):
    # BigQuery ignore_unknown_values: extra trailing values not in the
    # declared schema are ignored, the row's schema-prefix loads
    p = tmp_path / "extra.csv"
    p.write_text(
        "order_id,amount,order_date\n"
        "o1,10.5,2024-01-01\n"
        "o2,7.25,2024-01-02,UNEXPECTED,COLS\n"
    )
    schema = build_struct_type(ORDER_COLS)
    import pytest

    strict = sio.read_csv(spark, str(p), schema)
    with pytest.raises(Exception):
        strict.collect()
    df = sio.read_csv(spark, str(p), schema, ignore_unknown_values=True)
    rows = {r.order_id: r for r in df.collect()}
    assert set(rows) == {"o1", "o2"}
    assert rows["o2"].amount == 7.25


def test_csv_jagged_rows_fail_fast_by_default(spark, tmp_path):
    import pytest

    p = tmp_path / "jagged2.csv"
    p.write_text(
        "order_id,amount,order_date\no1,10.5,2024-01-01\no2,7.25\n"
    )
    schema = build_struct_type(ORDER_COLS)
    df = sio.read_csv(spark, str(p), schema)  # allow_jagged_rows=False
    with pytest.raises(Exception):
        df.collect()


def test_create_never_requires_existing_target(spark, tmp_path):
    import pytest

    df = spark.range(3).select(F.col("id").alias("v"))
    target = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError, match="CREATE_NEVER"):
        sio.write_append(df, target, create_disposition="CREATE_NEVER")
    # CREATE_IF_NEEDED provisions it; CREATE_NEVER then succeeds
    sio.write_full_overwrite(df, target)
    sio.write_append(df, target, create_disposition="CREATE_NEVER")
    assert spark.read.parquet(target).count() == 6
    with pytest.raises(ValueError, match="create_disposition"):
        sio.write_append(df, target, create_disposition="NOPE")


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


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_expr_matches_reference(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (7, 5), (65535, 1), (12345, 54321)],
        "a long, b long",
    )
    got = df.selectExpr("a", "b", f"{sio.morton_expr('a', 'b')} as z").collect()
    for r in got:
        assert r.z == _morton_py(r.a, r.b), (r.a, r.b)


def test_zorder_files_prune_on_both_dimensions(spark, tmp_path):
    out = str(tmp_path / "zorder")
    n, files = 128, 16
    grid = spark.range(0, n * n).selectExpr(
        f"id % {n} as x", f"id div {n} as y"
    )
    sio.write_zorder(grid, out, "x", "y", bits=8, n_files=files)
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        )
        .collect()
    )
    assert len(per_file) == files
    # the pruning property: a narrow band predicate on EITHER dimension
    # skips most files via min/max stats (a single-key x-sort prunes x
    # but leaves every y-band hitting ALL files; files straddling morton
    # quadrant boundaries legitimately span wide, so test pruning, not
    # per-file widths)
    lo, hi = 10, 20
    x_hits = sum(1 for r in per_file if r.x0 <= hi and r.x1 >= lo)
    y_hits = sum(1 for r in per_file if r.y0 <= hi and r.y1 >= lo)
    assert x_hits <= files * 3 // 4, (x_hits, per_file)
    assert y_hits <= files * 3 // 4, (y_hits, per_file)


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


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    from star_schema_etl_airflow_spark.sources.io import read_orc, write_orc

    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # exact content round-trip (order-insensitive)
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0
    # filters reach the ORC scan
    plan = back.filter(F.col("o_orderkey") == 7)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:200]


def test_zorder_3d_prunes_on_every_dimension(spark, tmp_path):
    out = str(tmp_path / "z3")
    n, files = 32, 16
    grid = spark.range(0, n * n * n).selectExpr(
        f"id % {n} as x", f"(id div {n}) % {n} as y", f"id div {n * n} as z"
    )
    sio.write_zorder_n(grid, out, ["x", "y", "z"], bits=5, n_files=files)
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
            F.min("z").alias("z0"), F.max("z").alias("z1"),
        )
        .collect()
    )
    assert len(per_file) == files
    lo, hi = 4, 7  # narrow band on each axis
    for a in ("x", "y", "z"):
        hits = sum(
            1 for r in per_file
            if r[f"{a}0"] <= hi and r[f"{a}1"] >= lo
        )
        # a single-key sort would leave two axes hitting ALL files
        assert hits <= files * 3 // 4, (a, hits)


def test_csv_quarantine_captures_bad_rows(spark, tmp_path):
    p = tmp_path / "q.csv"
    p.write_text(
        "order_id,amount,order_date\n"
        "o1,10.5,2024-01-01\n"
        "o2,NOT_A_NUMBER,2024-01-02\n"
        "o3,3.5,2024-01-03\n"
    )
    schema = build_struct_type(ORDER_COLS)
    good, bad = sio.read_csv_quarantine(spark, str(p), schema)
    assert {r.order_id for r in good.collect()} == {"o1", "o3"}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "NOT_A_NUMBER" in bad_rows[0].raw_line
    assert bad_rows[0].source_file.endswith("q.csv")


def test_jsonl_quarantine_captures_bad_lines(spark, tmp_path):
    p = tmp_path / "q.jsonl"
    p.write_text(
        '{"order_id": "o1", "amount": 10.5, "order_date": "2024-01-01"}\n'
        'THIS IS NOT JSON\n'
        '{"order_id": "o3", "amount": 3.5, "order_date": "2024-01-03"}\n'
    )
    schema = build_struct_type(ORDER_COLS)
    good, bad = sio.read_jsonl_quarantine(spark, str(p), schema)
    assert {r.order_id for r in good.collect()} == {"o1", "o3"}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "NOT JSON" in bad_rows[0].raw_line
    assert bad_rows[0].source_file.endswith("q.jsonl")


def test_parquet_schema_evolution_merge(spark, tmp_path):
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x")], ["id", "a"]).write.parquet(base + "/d=1")
    spark.createDataFrame([(2, "y", 9.5)], ["id", "a", "score"]).write.parquet(
        base + "/d=2"
    )
    df = sio.read_parquet_evolving(spark, base)
    assert {f.name for f in df.schema.fields} >= {"id", "a", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None        # pre-evolution batch -> NULL
    assert abs(rows[2].score - 9.5) < 1e-12


def test_hilbert_files_prune_on_both_dimensions(spark, tmp_path):
    """write_hilbert mirrors the write_zorder pruning proof — plus the
    curve key ranges behind the file cuts are disjoint by construction
    (range repartition), so min/max pruning is sound on either axis."""
    out = str(tmp_path / "hilbert")
    n, files = 128, 16
    grid = spark.range(0, n * n).selectExpr(
        f"id % {n} as x", f"id div {n} as y"
    )
    sio.write_hilbert(grid, out, "x", "y", bits=8, n_files=files)
    got = spark.read.parquet(out)
    assert got.count() == n * n
    per_file = (
        got.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        )
        .collect()
    )
    assert len(per_file) == files
    lo, hi = 10, 20
    x_hits = sum(1 for r in per_file if r.x0 <= hi and r.x1 >= lo)
    y_hits = sum(1 for r in per_file if r.y0 <= hi and r.y1 >= lo)
    assert x_hits <= files * 3 // 4, (x_hits, per_file)
    assert y_hits <= files * 3 // 4, (y_hits, per_file)
    # Hilbert's adjacency (every curve step is grid-adjacent) bounds
    # each file's box area by its key span; on the uniform grid no file
    # may cover the whole of either axis (Morton's boundary jumps can)
    assert all(r.x1 - r.x0 < n - 1 for r in per_file), per_file
    assert all(r.y1 - r.y0 < n - 1 for r in per_file), per_file


def test_hilbert_writer_key_matches_audit_curve(spark, tmp_path):
    """The writer sorts by the SAME xy→d walk the skipping audit scored
    (shared generator) — reading a 1-file write back in row order must
    reproduce the Python twin's curve order."""
    from star_schema_etl_airflow_spark.plans.zorder_layout import hilbert_d

    pts = [(x, y) for x in range(0, 16) for y in range(0, 16)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = str(tmp_path / "h1")
    sio.write_hilbert(df, out, "x", "y", bits=4, n_files=1)
    got = [(r.x, r.y) for r in spark.read.parquet(out).collect()]
    want = sorted(pts, key=lambda p: hilbert_d_at_bits(p, 4))
    assert got == want


def hilbert_d_at_bits(p, bits):
    """Python xy→d at arbitrary order (generalizes the audit's 8-bit
    twin for the writer's parameterized ``bits``)."""
    x, y = p
    d, s, n = 0, (1 << bits) // 2, 1 << bits
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d
