"""Salted join: result equality with the plain join, and salt spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of big rows share one hot key
    big = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(50)],
        "k string, weight double",
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "k").select("k", "payload", "weight")
    salted = salted_join(big, small, "k").select("k", "payload", "weight")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_spreads_hot_key(spark):
    big, small = _skewed_frames(spark)
    from star_schema_etl_airflow_spark.operators.skew import SALT_COL

    salt_src = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in big.columns])
    salted = big.withColumn(SALT_COL, F.pmod(F.xxhash64(salt_src), F.lit(16)))
    spread = (
        salted.filter(F.col("k") == "hot").select(SALT_COL).distinct().count()
    )
    assert spread == 16  # the hot key occupies every salt bucket
