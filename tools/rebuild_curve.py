#!/usr/bin/env python
"""Measured cost curve for ``rebuild_dimension`` (r11 verdict task 8).

The streaming SCD2 dead-letter defers history rewrites to an explicit
backfill rebuild that replays the ENTIRE landing history in run_date
order.  SCALE.md bounds that by landing-dir retention — this tool puts
numbers on the bound: a synthetic landing of D daily delta files
(initial key load + per-day churn of updates and new keys), rebuilt at
D = 30 / 60 / 120, reporting total wall and per-day cost.

Cost model being verified: each day's fold is ``apply_scd2`` — a
read-modify-write proportional to the CURRENT dimension size — plus a
fixed per-day floor (plan + localCheckpoint).  With realistic churn
(daily delta ≪ key universe) the dimension grows slowly, so per-day
cost should be ≈ flat across retention windows and the total ≈ linear
in D; a superlinear total would mean the per-day lineage truncation is
not holding.

Usage: python tools/rebuild_curve.py >> SCALE.md   (section appended
manually with interpretation)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/rebuild_curve"
N_KEYS = 20_000        # initial key universe
DAILY_UPDATES = 200    # churn: existing keys whose tracked attrs change
DAILY_NEW = 50         # brand-new keys per day
DAYS = [30, 60, 120]


def pyloop() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def day_str(i: int) -> str:
    # strictly increasing ISO dates: 2024-01-01 + i days, computed
    # without datetime.now() (fixed epoch)
    import datetime

    return str(datetime.date(2024, 1, 1) + datetime.timedelta(days=i))


def build_landing(spark, days: int) -> str:
    """One parquet file per day: day 0 = the initial load; each later
    day updates DAILY_UPDATES rotating existing keys and inserts
    DAILY_NEW new ones."""
    from pyspark.sql import functions as F

    landing = f"{WORK}/landing_{days}"
    if os.path.isdir(landing):
        return landing
    os.makedirs(landing)
    ids = spark.range(N_KEYS).select(F.col("id").alias("customer_id"))
    for d in range(days):
        ds = day_str(d)
        if d == 0:
            day = ids.select(
                "customer_id",
                F.concat(F.lit("v0-"), F.col("customer_id")).alias("email"),
                F.lit("city0").alias("city"),
                F.lit(ds).alias("run_date"),
            )
        else:
            upd = ids.filter(
                F.col("customer_id") % (N_KEYS // DAILY_UPDATES)
                == d % (N_KEYS // DAILY_UPDATES)
            ).select(
                "customer_id",
                F.concat(F.lit(f"v{d}-"), F.col("customer_id"))
                .alias("email"),
                F.lit(f"city{d}").alias("city"),
                F.lit(ds).alias("run_date"),
            )
            new = spark.range(
                N_KEYS + (d - 1) * DAILY_NEW, N_KEYS + d * DAILY_NEW
            ).select(
                F.col("id").alias("customer_id"),
                F.concat(F.lit("new-"), F.col("id")).alias("email"),
                F.lit(f"city{d}").alias("city"),
                F.lit(ds).alias("run_date"),
            )
            day = upd.unionByName(new)
        stage = f"{WORK}/stage_{days}_{d}"
        day.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage)
                    if f.startswith("part-") and f.endswith(".parquet"))
        os.rename(os.path.join(stage, part),
                  os.path.join(landing, f"delta_{ds}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
    return landing


def main() -> None:
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.session import get_spark
    from star_schema_etl_airflow_spark.streaming.scd2_stream import (
        rebuild_dimension,
    )

    spark = get_spark("rebuild-curve")
    spark.sparkContext.setLogLevel("ERROR")
    schema = T.StructType([
        T.StructField("customer_id", T.LongType()),
        T.StructField("email", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("run_date", T.StringType()),
    ])
    cal = [pyloop()]
    rows = []
    for days in DAYS:
        landing = build_landing(spark, days)
        n_landing = spark.read.schema(schema).parquet(landing).count()
        dim_path = f"{WORK}/dim_{days}"
        shutil.rmtree(dim_path, ignore_errors=True)
        shutil.rmtree(dim_path + "__dead_letter", ignore_errors=True)
        t0 = time.perf_counter()
        dim = rebuild_dimension(
            spark, landing, dim_path, schema,
            key="customer_id", tracked=["email", "city"],
        )
        dt = round(time.perf_counter() - t0, 2)
        n_dim = dim.count()
        rows.append((days, n_landing, n_dim, dt, round(dt / days, 3)))
        cal.append(pyloop())
        print(f"  {days} days: landing={n_landing} dim={n_dim} "
              f"total={dt}s per-day={dt / days:.3f}s", file=sys.stderr)

    print()
    print(f"Host pyloop stamps: {cal}.")
    print()
    print("| retention | landing rows | final dim rows | rebuild total "
          "| per-day |")
    print("|---|---|---|---|---|")
    for days, nl, nd, dt, per in rows:
        print(f"| {days} days | {nl} | {nd} | {dt}s | {per}s |")


if __name__ == "__main__":
    main()
