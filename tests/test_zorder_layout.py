"""Z-order layout skipping audit (plans/zorder_layout.py).

The sweep pins engine-vs-oracle value equality; these tests pin the
semantics: the Morton key construction, pruning soundness (no matching
row lives in a skipped file), the actual skipping advantage the layout
exists to provide, and the one-scan plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans import zorder_layout as mod
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_morton_key_matches_python_oracle(spark):
    rows = spark.range(0, 256, 17).selectExpr(
        "cast(id as bigint) as x8",
        "cast((id * 31) % 256 as bigint) as y8",
    )
    got = rows.withColumn(
        "z16", F.expr(mod._interleave("x8", "y8", "div"))
    ).collect()
    assert got
    for r in got:
        assert r["z16"] == mod.morton16(r["x8"], r["y8"])


def test_morton_locality():
    """Interleaving puts both dimensions' high bits on top: quadrant
    (x_hi, y_hi) determines the key's top bits, which is why key-range
    file cuts are tight in BOTH dimensions."""
    assert mod.morton16(0, 0) == 0
    assert mod.morton16(255, 255) == 65535
    # top bit of x lands at position 14, top bit of y at 15
    assert mod.morton16(128, 0) == 1 << 14
    assert mod.morton16(0, 128) == 1 << 15


def test_hilbert_key_matches_python_oracle_and_is_bijective(spark):
    # bijectivity over the full grid (python twin)
    seen = {mod.hilbert_d(x, y) for x in range(256) for y in range(256)}
    assert seen == set(range(65536))
    # staged SQL == python twin on a sample
    rows = spark.range(0, 256, 13).selectExpr(
        "cast(id as bigint) as hx",
        "cast((id * 97) % 256 as bigint) as hy",
        "cast(0 as bigint) as hd",
    )
    import pyspark.sql.functions as SF
    orig = [(r["hx"], r["hy"]) for r in rows.collect()]
    for d_e, x_e, y_e in mod._hilbert_steps("div"):
        rows = rows.withColumns(
            {"hd": SF.expr(d_e), "hx": SF.expr(x_e), "hy": SF.expr(y_e)}
        )
    got = rows.collect()
    for (x0, y0), r in zip(orig, got):
        assert r["hd"] == mod.hilbert_d(x0, y0)


def test_hilbert_locality_beats_morton_on_adjacency():
    """The reason Hilbert exists: consecutive curve positions are always
    grid-adjacent (step distance 1), while Morton takes long jumps —
    so Hilbert key-range files have tighter min-max boxes on average."""
    def step_dists(key_fn):
        pts = sorted(
            ((key_fn(x, y), x, y) for x in range(256) for y in range(256))
        )
        return [
            abs(a[1] - b[1]) + abs(a[2] - b[2])
            for a, b in zip(pts, pts[1:])
        ]
    h = step_dists(mod.hilbert_d)
    m = step_dists(mod.morton16)
    assert max(h) == 1                 # Hilbert: every step is adjacent
    assert max(m) > 1                  # Morton: long jumps exist
    assert sum(h) < sum(m)


def test_pruning_is_sound_and_matching_counts_exact(spark):
    out = {r["layout"]: r for r in mod.zorder_skip_stats(spark, SF_DIR).collect()}
    assert set(out) == {"linear", "zorder", "hilbert"}
    li = load_table(spark, SF_DIR, "lineitem")
    n_total = li.count()
    n_match = li.filter(
        (F.datediff(F.col("l_shipdate").cast("date"),
                    F.lit(mod.EPOCH.isoformat()).cast("date"))
         .between(mod.PRED_D1, mod.PRED_D2))
        & F.col("l_extendedprice").between(mod.PRED_P1, mod.PRED_P2)
    ).count()
    for layout, r in out.items():
        assert r["rows_total"] == n_total, layout
        # soundness: every matching row sits in a scanned file
        assert r["rows_matching"] == n_match, layout
        assert r["rows_scanned"] >= n_match, layout
        assert r["files_scanned"] <= r["files_total"], layout


def test_zorder_beats_linear_on_the_2d_predicate(spark):
    """The reason to Z-order: the same min-max pruning rule skips more
    under the interleaved layout because files are bounded in BOTH
    dimensions, not just the ingest-date axis."""
    out = {r["layout"]: r for r in mod.zorder_skip_stats(spark, SF_DIR).collect()}
    for curve in ("zorder", "hilbert"):
        assert out[curve]["rows_scanned"] < out["linear"]["rows_scanned"]
        assert out[curve]["files_scanned"] <= out["linear"]["files_scanned"]


def test_single_scan_no_joins(spark):
    """Both layouts are audited from ONE corpus scan (2-way explode),
    map-side partial aggregation, and no join of any kind."""
    df = mod.zorder_skip_stats(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    for node in ("Join", "CartesianProduct", "Window"):
        assert node not in plan
    assert "partial_" in plan  # map-side combine before the shuffle


def test_written_hilbert_files_realize_the_audited_pruning(spark, tmp_path):
    """The audit predicts per-file min-max boxes for the Hilbert layout;
    writing the SAME quantized dimensions through sources/io.py's
    write_hilbert must realize that pruning on real parquet footers:
    sound (every matching row in a scanned file) and strictly better
    than the audit's linear layout on the 2-D predicate.  The writer
    cuts files by equal FREQUENCY (repartitionByRange) where the audit
    cuts by equal KEY RANGE, so boxes differ file-by-file — the
    comparison is on the realized scan fraction."""
    from star_schema_etl_airflow_spark.sources import io as sio

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.expr(mod._CLAMP_S[0]),
        F.expr(mod._CLAMP_S[1]),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lit(mod.EPOCH.isoformat()).cast("date"),
        ).alias("d"),
        F.col("l_extendedprice").alias("p"),
    )
    out = str(tmp_path / "li_hilbert")
    sio.write_hilbert(li, out, "x8", "y8", bits=8, n_files=mod.N_FILES)

    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("d").alias("min_d"), F.max("d").alias("max_d"),
            F.min("p").alias("min_p"), F.max("p").alias("max_p"),
            F.count("*").alias("rows"),
            F.sum(
                (
                    (F.col("d") >= mod.PRED_D1)
                    & (F.col("d") <= mod.PRED_D2)
                    & (F.col("p") >= mod.PRED_P1)
                    & (F.col("p") <= mod.PRED_P2)
                ).cast("long")
            ).alias("matching"),
        )
        .collect()
    )
    scanned = [
        r for r in per_file
        if r.max_d >= mod.PRED_D1 and r.min_d <= mod.PRED_D2
        and r.max_p >= mod.PRED_P1 and r.min_p <= mod.PRED_P2
    ]
    rows_scanned = sum(r.rows for r in scanned)
    n_matching = sum(r.matching for r in per_file)
    # soundness: skipped files contain no matching rows
    assert sum(r.matching for r in scanned) == n_matching

    audit = {
        r["layout"]: r
        for r in mod.zorder_skip_stats(spark, SF_DIR).collect()
    }
    assert len(per_file) == audit["hilbert"]["files_total"]
    # the written layout realizes the audited advantage over linear…
    assert rows_scanned < audit["linear"]["rows_scanned"]
    assert len(scanned) <= audit["linear"]["files_scanned"]
    # …and lands in the audit's predicted band for the hilbert layout.
    # The writer cuts by equal FREQUENCY (repartitionByRange, sampled
    # boundaries) where the audit cuts by equal KEY RANGE: measured
    # realizations on this fixture are 1.8–1.95× the audit's
    # rows_scanned across input partitionings (None/3/7/13/32/64
    # upstream partitions → 1805–1924 vs audit 998 at sf0.01), i.e.
    # the old 2× band sat at the cliff edge of the range-partitioner's
    # sampling jitter and flaked once in a full-suite run; 3× bounds
    # the layout claim without sitting on the sampler's noise floor.
    assert rows_scanned <= 3 * audit["hilbert"]["rows_scanned"]
