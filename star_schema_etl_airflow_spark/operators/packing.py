"""Greedy sequence packing — batching documents into fixed token budgets.

Training pipelines pack variable-length documents into fixed-size context
windows (bins of ``capacity`` tokens) to minimize padding.  Optimal bin
packing is NP-hard and inherently sequential; the scale-correct compromise
is: hash-shard the corpus, pack GREEDILY within each shard in a stable
order.  Sharding makes it embarrassingly parallel (one pandas group per
shard via ``applyInPandas``); the stable order (doc_id) plus the
deterministic shard hash make the result independent of partitioning and
cluster size — and expressible as a recursive CTE, so the DuckDB oracle
checks it hash-exactly (rare for an ``applyInPandas`` operator).

Semantics: within a shard, docs are visited in doc_id order; a doc goes to
the current bin unless it would overflow ``capacity``, in which case it
opens a new bin.  A doc larger than ``capacity`` occupies a bin alone
(callers should length-filter first; the operator must still terminate).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.sampling import hash_bucket

PACK_SCHEMA = "shard int, doc_id long, tokens int, bin_id int"


def _pack_one_shard(pdf: pd.DataFrame, order: str = "key") -> pd.DataFrame:
    if order == "tokens_desc":
        # next-fit over decreasing sizes: deterministic (tokens desc,
        # doc_id asc).  NOTE: with next-fit (single open bin) decreasing
        # order is NOT guaranteed tighter than arrival order — that
        # guarantee belongs to first-fit-decreasing (``pack_ffd``); this
        # variant exists for oracle-checkable order control
        pdf = pdf.sort_values(
            ["tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
    else:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    cap = int(pdf["__cap"].iloc[0])
    bins, fill, bin_id = [], 0, 0
    first = True
    for t in pdf["tokens"]:
        if not first and fill + t > cap:
            bin_id += 1
            fill = t
        else:
            fill += t
            first = False
        bins.append(bin_id)
    out = pdf[["shard", "doc_id", "tokens"]].copy()
    out["bin_id"] = pd.Series(bins, dtype="int32")
    return out


def pack_greedy(
    df: DataFrame,
    key: str,
    tokens_col: str,
    capacity: int,
    n_shards: int = 8,
    seed: str = "shard",
    order: str = "key",
) -> DataFrame:
    """Assign each row a ``(shard, bin_id)`` under a greedy token budget.

    ``df`` needs a stable integer/string ``key`` and an integer
    ``tokens_col``.  ``order='key'`` packs in doc_id order (stream-
    friendly); ``order='tokens_desc'`` packs next-fit-decreasing (tighter
    bins).  Arrow-batched ``applyInPandas``: one pandas call per
    shard, O(rows/shard) memory — choose ``n_shards`` so a shard fits an
    executor (at 100 TB that's simply more shards; packing quality is
    unaffected because bins never span shards).
    """
    prepared = df.select(
        (hash_bucket(f"cast({key} as string)", seed) % n_shards)
        .cast("int")
        .alias("shard"),
        F.col(key).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("int").alias("tokens"),
        F.lit(capacity).alias("__cap"),
    )
    return prepared.groupBy("shard").applyInPandas(
        lambda pdf: _pack_one_shard(pdf, order), schema=PACK_SCHEMA
    )


def _pack_ffd_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing within a shard: visit docs largest-first and
    place each into the FIRST existing bin with room (new bin otherwise).
    Guaranteed ≤ next-fit bins on the same order, and ≤ 11/9·OPT + 1
    (the classic FFD bound).  O(n·bins) scan per shard — fine, shards are
    executor-sized.  Not expressible as a linear recursive CTE (state is
    the whole open-bin list), so this variant is pytest-checked rather
    than DuckDB-oracled."""
    pdf = pdf.sort_values(
        ["tokens", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    cap = int(pdf["__cap"].iloc[0])
    fills: list[int] = []
    assignment = []
    for t in pdf["tokens"]:
        placed = None
        for i, f in enumerate(fills):
            if f + t <= cap:
                placed = i
                break
        if placed is None:
            fills.append(t)
            placed = len(fills) - 1
        else:
            fills[placed] += t
        assignment.append(placed)
    out = pdf[["shard", "doc_id", "tokens"]].copy()
    out["bin_id"] = pd.Series(assignment, dtype="int32")
    return out


def pack_ffd(
    df: DataFrame,
    key: str,
    tokens_col: str,
    capacity: int,
    n_shards: int = 8,
    seed: str = "shard",
) -> DataFrame:
    """First-fit-decreasing packing (the quality variant of
    :func:`pack_greedy`; same sharding and determinism contract)."""
    prepared = df.select(
        (hash_bucket(f"cast({key} as string)", seed) % n_shards)
        .cast("int")
        .alias("shard"),
        F.col(key).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("int").alias("tokens"),
        F.lit(capacity).alias("__cap"),
    )
    return prepared.groupBy("shard").applyInPandas(
        _pack_ffd_shard, schema=PACK_SCHEMA
    )


def bin_utilization(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-bin fill report: tokens used, docs, utilization fraction."""
    return (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.sum("tokens").alias("bin_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn(
            "utilization", F.round(F.col("bin_tokens") / F.lit(capacity), 9)
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_expr: str,
    shard_rows: int,
    seed: str = "shard0",
    token_col: str | None = None,
):
    """Write the corpus as size-bounded, reproducibly-ordered training
    shards plus a manifest — the hand-off format a trainer's data loader
    consumes (WebDataset/TFRecord sharding, parquet-flavored).

    Rows get a deterministic global position (hash-ordered, a function of
    the data — ``operators/sampling.deterministic_shuffle``), the shard id
    is ``pos div shard_rows``, and the output is hive-partitioned by
    ``shard`` so a loader can open any subset.  The manifest (one row per
    shard: row count, token sum, min/max position) is derived from the
    same frame — no second scan of the written files.

    Returns the manifest DataFrame (also written to ``<path>__manifest``).
    """
    from star_schema_etl_airflow_spark.operators.sampling import (
        deterministic_shuffle,
    )
    from star_schema_etl_airflow_spark.sources.io import write_full_overwrite

    ranked = deterministic_shuffle(df, key_expr, seed, pos_col="__pos")
    sharded = ranked.withColumn(
        "shard", ((F.col("__pos") - 1) / shard_rows).cast("long")
    )
    write_full_overwrite(sharded.drop("__pos"), path, partition_by="shard")

    tok = (
        F.sum(F.col(token_col)).alias("n_tokens")
        if token_col
        else F.lit(None).cast("long").alias("n_tokens")
    )
    manifest = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            tok,
            F.min("__pos").alias("first_pos"),
            F.max("__pos").alias("last_pos"),
        )
        .orderBy("shard")
    )
    write_full_overwrite(manifest, path.rstrip("/") + "__manifest")
    return manifest
