"""Deterministic (hash-based) sampling, splitting, and corpus mixing.

Training-data pipelines need sampling that is REPRODUCIBLE: re-running the
pipeline, on any cluster size, with any partitioning, must select the same
rows — otherwise dataset versions aren't comparable and eval contamination
can't be audited.  RNG-based ``df.sample``/``sampleBy`` is seed-stable only
per-partitioning; the scale-correct tool is a content hash of a stable key:

    keep row  ⇔  md5(seed || key) mod 10_000  <  floor(fraction * 10_000)

- embarrassingly parallel (no shuffle, no state, pure map)
- independent samples per ``seed`` (md5 avalanche ⇒ bucket independence)
- identical row sets in any engine that can md5 — which is what lets the
  DuckDB oracle check these EXACTLY instead of via statistical bounds.

``hash_split`` is the train/val/test variant of the same idea;
``mix_to_weights`` composes it with per-stratum fractions computed from
exact stratum counts to hit target mixture proportions (bounded by the
scarcest stratum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import md5_long_spark

BUCKETS = 10_000


def hash_bucket(key_expr: str, seed: str) -> Column:
    """Stable bucket in [0, BUCKETS) from the md5 of ``seed || key``.

    ``key_expr`` is a Spark SQL string expression for the stable row key
    (cast to string).  Different seeds give independent bucketings.
    """
    return F.expr(f"pmod({md5_long_spark(key_expr, seed)}, {BUCKETS})")


def threshold(fraction: float) -> int:
    """Bucket threshold for a keep-fraction (floor: both engines agree)."""
    import math

    return int(math.floor(min(max(fraction, 0.0), 1.0) * BUCKETS))


def deterministic_sample(df: DataFrame, key_expr: str, fraction: float,
                         seed: str) -> DataFrame:
    """Keep a stable ~``fraction`` of rows, selected by key hash."""
    return df.filter(hash_bucket(key_expr, seed) < threshold(fraction))


def hash_split(df: DataFrame, key_expr: str, seed: str,
               cuts: dict[str, float], split_col: str = "split") -> DataFrame:
    """Disjoint named splits (e.g. train/val/test) by hash-bucket range.

    ``cuts`` maps split name → fraction; fractions must sum to ≤ 1 (any
    remainder is dropped, which is how holdout carve-outs work).
    """
    b = hash_bucket(key_expr, seed)
    expr = F.lit(None).cast("string")
    hi = 0.0
    for name, frac in cuts.items():
        lo_t, hi = threshold(hi), hi + frac
        expr = F.when((b >= lo_t) & (b < threshold(hi)), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr).filter(F.col(split_col).isNotNull())


def mixture_fractions(counts: dict[str, int],
                      weights: dict[str, float]) -> dict[str, float]:
    """Per-stratum keep-fractions that realize ``weights`` proportions.

    The achievable corpus size is bound by the scarcest stratum:
    ``factor = min(count_s / weight_s)``; stratum s keeps
    ``weight_s * factor / count_s`` of its rows.  Pure float arithmetic —
    the DuckDB oracle reproduces it bit-identically.
    """
    factor = min(counts[s] / weights[s] for s in weights)
    return {s: min(weights[s] * factor / counts[s], 1.0) for s in weights}


def shuffle_sort_key(key_expr: str, seed: str) -> Column:
    """Single string column whose lexicographic order is (hash, key) order:
    zero-padded hex of the 60-bit hash, then the key as tiebreak (hash
    collisions are ~2^-30, but determinism must not depend on luck)."""
    return F.expr(
        f"concat(lpad(hex({md5_long_spark(key_expr, seed)}), 16, '0'), "
        f"'|', {key_expr})"
    )


def deterministic_shuffle(df: DataFrame, key_expr: str, seed: str,
                          pos_col: str = "pos",
                          num_partitions: int | None = None) -> DataFrame:
    """Reproducible global shuffle: position 1..N ordered by the key hash.

    Training-data epoch ordering must be a *function of the data*, not of
    the cluster: re-running on any partitioning yields the same sequence,
    and each ``seed`` is an independent permutation (epoch number as seed).

    Scale path: NO single-partition global window — positions come from the
    two-pass range-partition rank (``assign_surrogate_keys``: parallel
    per-partition windows + a driver-side cumulative sum of partition
    counts), so every stage is parallel at 100 TB.
    """
    from star_schema_etl_airflow_spark.operators.scd2 import assign_surrogate_keys

    out = assign_surrogate_keys(
        df.withColumn("__shufkey", shuffle_sort_key(key_expr, seed)),
        "__shufkey", 0, pos_col, num_partitions,
    )
    return out.drop("__shufkey")


def cap_per_group(df: DataFrame, group_col: str, n: int, key_expr: str,
                  seed: str, rank_col: str | None = None) -> DataFrame:
    """Per-group quota: keep at most ``n`` rows per ``group_col`` value,
    chosen deterministically by content-hash order (the domain-balancing
    step of crawl curation — no single site may dominate the corpus).

    Selection is a pure function of the data: rows rank by
    ``md5(seed:key)`` within their group, ties broken by the key itself,
    so re-runs, repartitioning, and retries keep identical rows, and each
    ``seed`` draws an independent quota sample.

    Scale design: the ``row_number() <= n`` filter plans with a map-side
    *Partial* ``WindowGroupLimit`` (see ``tests/test_plans.py``), so each
    scan partition ships at most ``n`` rows per group — a mega-domain's
    millions of pages never cross the wire, only ``partitions × n`` of
    them do.  Group cardinality (domains) is high, so the final window's
    partitioning is skew-free by construction."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.expr(md5_long_spark(key_expr, seed)), F.expr(key_expr)
    )
    ranked = df.withColumn(rank_col or "__qrank", F.row_number().over(w))
    kept = ranked.filter(F.col(rank_col or "__qrank") <= n)
    return kept if rank_col else kept.drop("__qrank")


def mix_to_weights(df: DataFrame, stratum_col: str, key_expr: str,
                   weights: dict[str, float], seed: str) -> DataFrame:
    """Downsample strata so the result mixes to ``weights`` proportions.

    The per-stratum counts are a single tiny aggregate (one row per
    stratum — strata are bounded: languages, sources, domains), collected
    to the driver to compute thresholds; the sampling pass itself is a
    pure map over the data.  Strata not named in ``weights`` are dropped.
    """
    rows = (
        df.filter(F.col(stratum_col).isin(list(weights)))
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {r[stratum_col]: r["n"] for r in rows}
    fracs = mixture_fractions(counts, weights)
    b = hash_bucket(key_expr, seed)
    keep = F.lit(False)
    for s, frac in fracs.items():
        keep = keep | ((F.col(stratum_col) == s) & (b < threshold(frac)))
    return df.filter(keep)


def sample_weighted(df: DataFrame, key_expr: str, weight_col: str,
                    seed: str) -> DataFrame:
    """Per-row weighted Bernoulli sampling, deterministic: a row with
    weight w (in [0,1]) survives iff its hash bucket < floor(w*BUCKETS).
    The same row under the same seed always makes the same decision —
    reruns, retries, and re-partitioning can't change the sample (the
    property plain ``df.sample`` lacks), and upsampling a quality score
    into a keep-probability becomes a pure map."""
    b = hash_bucket(key_expr, seed)
    return df.filter(
        b < F.floor(
            F.least(F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(1.0))
            * BUCKETS
        )
    )
