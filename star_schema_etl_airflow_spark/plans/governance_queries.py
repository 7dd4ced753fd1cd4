"""Data-governance queries: k-anonymity / l-diversity audit and a
fixed-bin histogram profile.

Training corpora and analytics releases both go through privacy
screening before they leave the pipeline; the k-anonymity audit is the
standard first gate — every quasi-identifier combination must be shared
by ≥ k individuals, and (l-diversity) must not collapse to a single
sensitive value.  Both queries are single hash-aggregations: one shuffle
on the quasi-identifier key, map-side combine, no joins on the big side
— the shape survives any corpus size.

Reference parity: beyond-reference (governance surface; the reference
has no data-quality or privacy tooling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.functions.caching import persist_once

K_ANON = 5
# sensitive attribute: account-balance bucketed to thousands (a stand-in
# for any per-individual sensitive value)
BAL_BUCKET = 1000


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per quasi-identifier group (nation × market segment): group size,
    l-diversity of the bucketed balance, and the k-anonymity verdict.
    Groups below k are re-identification risks the release must
    generalize or suppress."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("*").alias("group_size"),
            F.countDistinct(
                F.floor(F.col("c_acctbal") / BAL_BUCKET)
            ).alias("l_diversity"),
            (F.count("*") >= K_ANON).alias("is_k_anonymous"),
        )
    )


K_ANON_ORACLE = f"""
SELECT n.n_name AS nation,
       c.c_mktsegment AS segment,
       COUNT(*) AS group_size,
       COUNT(DISTINCT FLOOR(c.c_acctbal / {BAL_BUCKET})) AS l_diversity,
       COUNT(*) >= {K_ANON} AS is_k_anonymous
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2
"""

# --- fixed-bin histogram ----------------------------------------------------

HIST_LO = 0.0
HIST_HI = 110_000.0
HIST_BINS = 22


def hist_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of lineitem extended price —
    data-independent bin edges so the layout is fixed across runs and
    scale factors (no min/max pre-pass); one map + one tiny aggregation
    on the bin id.  The bin arithmetic is written out explicitly
    (identical IEEE ops on both engines) rather than through
    ``width_bucket``, which DuckDB lacks."""
    li = load_table(spark, sf_dir, "lineitem")
    width = (HIST_HI - HIST_LO) / HIST_BINS
    bucket = (
        F.when(F.col("l_extendedprice") < HIST_LO, F.lit(0))
        .when(F.col("l_extendedprice") >= HIST_HI, F.lit(HIST_BINS + 1))
        .otherwise(
            F.floor((F.col("l_extendedprice") - HIST_LO) / F.lit(width)) + 1
        )
        .cast("long")
    )
    return (
        li.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.lit(HIST_LO)
             + (F.col("bucket") - 1)
             * F.lit((HIST_HI - HIST_LO) / HIST_BINS)).alias("bin_lo"),
            (F.lit(HIST_LO)
             + F.col("bucket")
             * F.lit((HIST_HI - HIST_LO) / HIST_BINS)).alias("bin_hi"),
            "n",
        )
    )


HIST_ORACLE = f"""
SELECT bucket,
       {HIST_LO} + (bucket - 1) * {(HIST_HI - HIST_LO) / HIST_BINS} AS bin_lo,
       {HIST_LO} + bucket * {(HIST_HI - HIST_LO) / HIST_BINS} AS bin_hi,
       COUNT(*) AS n
FROM (
  SELECT CAST(CASE
    WHEN l_extendedprice < {HIST_LO} THEN 0
    WHEN l_extendedprice >= {HIST_HI} THEN {HIST_BINS + 1}
    ELSE FLOOR((l_extendedprice - {HIST_LO})
               / CAST({(HIST_HI - HIST_LO) / HIST_BINS} AS DOUBLE)) + 1
  END AS BIGINT) AS bucket
  FROM lineitem
)
GROUP BY 1
"""

# --- market-basket pair counting -------------------------------------------

MIN_SUPPORT = 2


def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs co-purchased in the same order with support ≥ 2 — the
    pair-counting core of frequent-itemset mining.  The self-join is
    keyed on the order (baskets are small, so per-order pair fan-out is
    ~|basket|², bounded); the count then shuffles once on the pair key.
    At scale, oversized baskets get capped (top-N items per basket) to
    bound the quadratic term — the standard A-priori engineering trade."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
    )


BASKET_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS support
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= {MIN_SUPPORT}
"""

register(QuerySpec("k_anonymity_audit", k_anonymity_audit, K_ANON_ORACLE,
                   tags=("GOVERNANCE", "A1", "A3")))
register(QuerySpec("hist_extendedprice", hist_extendedprice, HIST_ORACLE,
                   tags=("GOVERNANCE", "A1")))
register(QuerySpec("basket_pairs", basket_pairs, BASKET_ORACLE,
                   tags=("GOVERNANCE", "J1", "A1")))


# --- association rules ------------------------------------------------------

MIN_LIFT = 2.0


def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules a→b over the supported pairs: confidence =
    P(b|a) and lift = confidence / P(b), keeping rules whose lift ≥ 2
    (co-occurrence at least twice the independence rate — the meaningful
    gate for sparse baskets, where absolute confidence is tiny).  Item
    supports re-aggregate the distinct basket-item relation (one extra
    shuffle on the item key); the tiny item-support table broadcasts
    into the rule join.  Both directions of every pair are emitted
    (a→b and b→a differ in confidence).  Ratios are single double
    divisions of exact integer counts — deterministic on both engines."""
    li = persist_once(load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct())
    n_orders = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item_support = li.groupBy("l_partkey").agg(
        F.count("*").alias("item_n")
    )
    a, b = li.alias("a"), li.alias("b")
    pair_support = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= MIN_SUPPORT)
    )
    # both rule directions from one pair relation
    rules = pair_support.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "pair_n",
    ).unionByName(
        pair_support.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "pair_n",
        )
    )
    ante = item_support.select(
        F.col("l_partkey").alias("antecedent"), F.col("item_n").alias("ante_n")
    )
    cons = item_support.select(
        F.col("l_partkey").alias("consequent"), F.col("item_n").alias("cons_n")
    )
    return (
        rules.join(F.broadcast(ante), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            "pair_n",
            (F.col("pair_n").cast("double") / F.col("ante_n").cast("double"))
            .alias("confidence"),
            (
                (F.col("pair_n").cast("double") / F.col("ante_n").cast("double"))
                / (F.col("cons_n").cast("double") / F.col("n_orders").cast("double"))
            ).alias("lift"),
        )
        .filter(F.col("lift") >= MIN_LIFT)
    )


BASKET_RULES_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
isup AS (SELECT l_partkey, COUNT(*) AS item_n FROM items GROUP BY 1),
psup AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS pair_n
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPPORT}
),
rules AS (
  SELECT part_a AS antecedent, part_b AS consequent, pair_n FROM psup
  UNION ALL
  SELECT part_b, part_a, pair_n FROM psup
)
SELECT r.antecedent, r.consequent, r.pair_n,
       CAST(r.pair_n AS DOUBLE) / CAST(sa.item_n AS DOUBLE) AS confidence,
       (CAST(r.pair_n AS DOUBLE) / CAST(sa.item_n AS DOUBLE))
         / (CAST(sc.item_n AS DOUBLE) / CAST(n.n_orders AS DOUBLE)) AS lift
FROM rules r
JOIN isup sa ON sa.l_partkey = r.antecedent
JOIN isup sc ON sc.l_partkey = r.consequent
CROSS JOIN n
WHERE (CAST(r.pair_n AS DOUBLE) / CAST(sa.item_n AS DOUBLE))
        / (CAST(sc.item_n AS DOUBLE) / CAST(n.n_orders AS DOUBLE))
      >= {MIN_LIFT}
"""

register(QuerySpec("basket_rules", basket_rules, BASKET_RULES_ORACLE,
                   tags=("GOVERNANCE", "J1", "A1")))


# --- right-to-erasure cascade audit ----------------------------------------

# Deterministic stand-in for the deletion-request table: customers whose
# seeded id hash lands in the modulus class (~2.5% of customers).  At
# deployment the flag comes from a semi-join against the actual request
# table (broadcast — request lists are small); deriving it from the same
# key keeps this audit fully differential.
ERASE_SEED = "erasure"
ERASE_MOD = 41
PCT_DECIMALS = 9


def gdpr_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR art. 17) cascade audit: given the deletion
    request set over ``customer``, count rows purged vs retained as the
    deletion propagates customer → orders → lineitem, one row per table.

    Scale design: customer and orders never join anything — the request
    flag is computed in-scan (at deployment: broadcast semi-join) and the
    per-table tallies are single map-side-combined aggregations.  The
    only join carries the flag from orders to lineitem on the orderkey —
    the same equi-join shape as fact assembly (shuffle on a uniform key,
    AQE-safe).  Output is 3 rows regardless of corpus size."""
    from star_schema_etl_airflow_spark.functions.text import md5_long_spark

    flag_of = lambda key: F.expr(  # noqa: E731
        md5_long_spark(f"cast({key} as string)", seed=ERASE_SEED)
    ) % ERASE_MOD == 0

    def tally(df: DataFrame, name: str, flag) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.sum(flag.cast("long")).alias("rows_purged"),
            F.sum((~flag).cast("long")).alias("rows_retained"),
        )

    cust = load_table(spark, sf_dir, "customer").select(
        flag_of("c_custkey").alias("f")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", flag_of("o_custkey").alias("f")
    )
    line = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    line_flag = line.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    out = (
        tally(cust, "customer", F.col("f"))
        .unionByName(tally(orders.select("f"), "orders", F.col("f")))
        .unionByName(tally(line_flag, "lineitem", F.col("f")))
    )
    return out.select(
        "table_name",
        "rows_purged",
        "rows_retained",
        F.round(
            F.col("rows_purged").cast("double")
            / (F.col("rows_purged") + F.col("rows_retained")).cast("double"),
            PCT_DECIMALS,
        ).alias("purge_pct"),
    )


def _erase_flag_duck(key: str) -> str:
    from star_schema_etl_airflow_spark.functions.text import md5_long_duck

    return f"({md5_long_duck(f'CAST({key} AS VARCHAR)', seed=ERASE_SEED)}) % {ERASE_MOD} = 0"


ERASURE_CASCADE_ORACLE = f"""
WITH c AS (
  SELECT 'customer' AS table_name,
         SUM(CASE WHEN {_erase_flag_duck('c_custkey')} THEN 1 ELSE 0 END)
           AS rows_purged,
         SUM(CASE WHEN {_erase_flag_duck('c_custkey')} THEN 0 ELSE 1 END)
           AS rows_retained
  FROM customer
),
o AS (
  SELECT 'orders' AS table_name,
         SUM(CASE WHEN {_erase_flag_duck('o_custkey')} THEN 1 ELSE 0 END)
           AS rows_purged,
         SUM(CASE WHEN {_erase_flag_duck('o_custkey')} THEN 0 ELSE 1 END)
           AS rows_retained
  FROM orders
),
l AS (
  SELECT 'lineitem' AS table_name,
         SUM(CASE WHEN {_erase_flag_duck('og.o_custkey')} THEN 1 ELSE 0 END)
           AS rows_purged,
         SUM(CASE WHEN {_erase_flag_duck('og.o_custkey')} THEN 0 ELSE 1 END)
           AS rows_retained
  FROM lineitem li JOIN orders og ON li.l_orderkey = og.o_orderkey
),
u AS (
  SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l
)
SELECT table_name,
       CAST(rows_purged AS BIGINT) AS rows_purged,
       CAST(rows_retained AS BIGINT) AS rows_retained,
       ROUND(CAST(rows_purged AS DOUBLE)
             / CAST(rows_purged + rows_retained AS DOUBLE),
             {PCT_DECIMALS}) AS purge_pct
FROM u
"""

register(QuerySpec("gdpr_erasure_cascade", gdpr_erasure_cascade,
                   ERASURE_CASCADE_ORACLE, tags=("GOVERNANCE",)))
