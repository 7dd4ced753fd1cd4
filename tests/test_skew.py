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


def test_aqe_splits_skewed_sort_merge_join(spark):
    """AQE's runtime skew-join handling: with the skew thresholds pulled
    down to fixture scale, the hot key's map partition must be split —
    the FINAL adaptive plan (readable only after executing this exact
    queryExecution, hence the collect) shows ``SortMergeJoin(skew=true)``
    with a ``skewed`` AQEShuffleRead.  Built-in complement to the
    explicit salted join (still the tool where AQE cannot apply: a
    consumer requiring the join key's distribution — e.g. a groupBy on
    that key — vetoes the split, as does a pre-bucketed layout)."""
    import re

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
            ).alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(0, 100).select(
            F.concat(F.lit("k"), (F.col("id") % 51).cast("string")).alias("k"),
            F.col("id").alias("w"),
        ).unionAll(
            spark.range(0, 5).select(
                F.lit("hot").alias("k"), F.col("id").alias("w")
            )
        )
        # global agg consumer: no distribution requirement on k, so the
        # skew split is legal
        j = big.join(small, "k").agg(
            F.sum("payload").alias("s"), F.count("*").alias("n")
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"SortMergeJoin\(skew=true\)", plan), plan[:2000]
        assert "skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
