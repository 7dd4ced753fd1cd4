"""Oracle-checked training-data sampling/curation queries: hash-based
train/val/test split, deterministic stratified sampling, corpus mixing to
target language weights, and greedy sequence packing.

All four are EXACT differential checks (not statistical bounds): the
sampling operators hash row keys instead of drawing randoms
(``operators/sampling.py``), and the packer's shard-local greedy order is
reproducible as a recursive CTE (``operators/packing.py``) — so DuckDB
derives the identical row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import md5_long_duck
from star_schema_etl_airflow_spark.operators.packing import pack_greedy
from star_schema_etl_airflow_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    hash_split,
    mix_to_weights,
    threshold,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

_KEY_S = "cast(doc_id as string)"
_KEY_D = "CAST(doc_id AS VARCHAR)"


def _bucket_duck(seed: str) -> str:
    return f"({md5_long_duck(_KEY_D, seed)} % {BUCKETS})"


# --- SPLIT: train/val/test by key hash ------------------------------------

SPLIT_SEED = "split"
SPLIT_CUTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, _KEY_S, SPLIT_SEED, SPLIT_CUTS).select(
        "doc_id", "lang", "split"
    )


def _split_oracle() -> str:
    # embed the exact integer thresholds the operator computes, so the
    # oracle can't drift from Python float accumulation order
    edges, hi = [], 0.0
    for name, frac in SPLIT_CUTS.items():
        lo_t, hi = threshold(hi), hi + frac
        edges.append((name, lo_t, threshold(hi)))
    cases = "\n".join(
        f"         WHEN b >= {lo} AND b < {hi_} THEN '{name}'"
        for name, lo, hi_ in edges
    )
    return f"""
WITH b AS (
  SELECT doc_id, lang, {_bucket_duck(SPLIT_SEED)} AS b FROM documents
)
SELECT doc_id, lang,
       CASE {cases}
       END AS split
FROM b
WHERE CASE {cases} END IS NOT NULL
"""


# --- STRAT: deterministic stratified sample -------------------------------

STRAT_SEED = "strat"
STRAT_FRACS = {"en": 0.25, "es": 0.5, "de": 0.5, "fr": 0.75, "zh": 1.0}


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(_KEY_S, STRAT_SEED)
    keep = F.lit(False)
    for lang, frac in STRAT_FRACS.items():
        keep = keep | ((F.col("lang") == lang) & (b < threshold(frac)))
    return docs.filter(keep).select("doc_id", "lang", "source")


def _strat_oracle() -> str:
    conds = " OR ".join(
        f"(lang = '{lang}' AND {_bucket_duck(STRAT_SEED)} < {threshold(frac)})"
        for lang, frac in STRAT_FRACS.items()
    )
    return f"SELECT doc_id, lang, source FROM documents WHERE {conds}"


# --- MIX: downsample strata to target corpus weights ----------------------

MIX_SEED = "mix"
MIX_WEIGHTS = {"en": 0.4, "es": 0.2, "fr": 0.2, "de": 0.1, "zh": 0.1}


def mix_corpora(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mix_to_weights(docs, "lang", _KEY_S, MIX_WEIGHTS, MIX_SEED).select(
        "doc_id", "lang"
    )


def _mix_oracle() -> str:
    values = ", ".join(
        f"('{s}', CAST({w} AS DOUBLE))" for s, w in MIX_WEIGHTS.items()
    )
    # float expressions mirror mixture_fractions() op-for-op:
    # factor = min(n / w); frac = least((w * factor) / n, 1.0)
    return f"""
WITH w(lang, wt) AS (VALUES {values}),
counts AS (
  SELECT d.lang, CAST(COUNT(*) AS DOUBLE) AS n
  FROM documents d JOIN w ON d.lang = w.lang GROUP BY d.lang
),
f AS (SELECT MIN(c.n / w.wt) AS factor FROM counts c JOIN w ON c.lang = w.lang),
thr AS (
  SELECT c.lang,
         CAST(FLOOR(LEAST((w.wt * f.factor) / c.n, 1.0) * {BUCKETS}) AS BIGINT)
           AS t
  FROM counts c JOIN w ON c.lang = w.lang CROSS JOIN f
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE {_bucket_duck(MIX_SEED)} < thr.t
"""


# --- PACK: greedy sequence packing ----------------------------------------

PACK_CAPACITY = 256
PACK_SHARDS = 8
PACK_SEED = "shard"


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens_i", F.expr("(n_chars + 3) div 4")
    )
    return pack_greedy(
        docs, "doc_id", "tokens_i", PACK_CAPACITY,
        n_shards=PACK_SHARDS, seed=PACK_SEED,
    )


def _pack_oracle(order_sql: str = "doc_id") -> str:
    return f"""
WITH RECURSIVE base AS (
  SELECT CAST({_bucket_duck(PACK_SEED)} % {PACK_SHARDS} AS INTEGER) AS shard,
         doc_id,
         CAST((n_chars + 3) // 4 AS INTEGER) AS tokens
  FROM documents
), seq AS (
  SELECT shard, doc_id, tokens,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY {order_sql}) AS rn
  FROM base
), pack AS (
  SELECT shard, doc_id, tokens, rn,
         CAST(0 AS INTEGER) AS bin_id, tokens AS fill
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.shard, s.doc_id, s.tokens, s.rn,
         CAST(CASE WHEN p.fill + s.tokens > {PACK_CAPACITY}
              THEN p.bin_id + 1 ELSE p.bin_id END AS INTEGER),
         CASE WHEN p.fill + s.tokens > {PACK_CAPACITY}
              THEN s.tokens ELSE p.fill + s.tokens END
  FROM pack p JOIN seq s ON s.shard = p.shard AND s.rn = p.rn + 1
)
SELECT shard, doc_id, tokens, bin_id FROM pack
"""


# --- registration ---------------------------------------------------------

register(QuerySpec("split_hash", split_hash, _split_oracle(), tags=("SPLIT",)))
register(QuerySpec("sample_stratified", sample_stratified, _strat_oracle(),
                   tags=("STRAT",)))
register(QuerySpec("mix_corpora", mix_corpora, _mix_oracle(), tags=("MIX",)))
def pack_sequences_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit-decreasing variant: long docs first within each shard —
    same recursive-CTE oracle with the decreasing visit order."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens_i", F.expr("(n_chars + 3) div 4")
    )
    return pack_greedy(
        docs, "doc_id", "tokens_i", PACK_CAPACITY,
        n_shards=PACK_SHARDS, seed=PACK_SEED, order="tokens_desc",
    )


register(QuerySpec("pack_sequences", pack_sequences, _pack_oracle(),
                   tags=("PACK",)))
register(QuerySpec("pack_sequences_sorted", pack_sequences_sorted,
                   _pack_oracle("tokens DESC, doc_id"), tags=("PACK",)))


def sample_weighted_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: each document's keep-probability
    is its type-token ratio (clamped to [0,1]) — higher-quality docs
    oversampled, deterministically (``operators/sampling.sample_weighted``)."""
    from star_schema_etl_airflow_spark.functions.text import tokens_spark
    from star_schema_etl_airflow_spark.operators.sampling import (
        sample_weighted,
    )

    toks = tokens_spark("text")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr(
            f"cast(size(array_distinct({toks})) as double)"
            f" / cast(size({toks}) as double)"
        ).alias("w"),
    )
    return sample_weighted(docs, "cast(doc_id as string)", "w", "wsample")


SAMPLE_WEIGHTED_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(list_distinct({{toks}})) AS DOUBLE)
           / CAST(len({{toks}}) AS DOUBLE) AS w
  FROM documents
)
SELECT doc_id, lang, w FROM t
WHERE {{h}} < floor(least(greatest(w, 0.0), 1.0) * {{buckets}})
"""


def _weighted_oracle() -> str:
    from star_schema_etl_airflow_spark.functions.text import (
        md5_long_duck,
        tokens_duck,
    )
    from star_schema_etl_airflow_spark.operators.sampling import BUCKETS

    h = md5_long_duck("CAST(doc_id AS VARCHAR)", "wsample")
    return SAMPLE_WEIGHTED_ORACLE.format(
        toks=tokens_duck("text"),
        h=f"{h} % {BUCKETS}",
        buckets=BUCKETS,
    )


register(QuerySpec("sample_weighted", sample_weighted_quality,
                   _weighted_oracle(), tags=("LLM-sampling",)))


# --- CAP: per-source quota (domain balancing) ------------------------------

CAP_SEED = "srccap"
CAP_N = 15   # fixture sources hold 25 docs each — the quota must bind


def cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: at most CAP_N docs per source, hash-chosen.
    The quota window is WindowGroupLimit-friendly (``operators/sampling.py
    ::cap_per_group`` scale notes; plan pinned in tests/test_plans.py)."""
    from star_schema_etl_airflow_spark.operators.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    return cap_per_group(docs, "source", CAP_N, _KEY_S, CAP_SEED,
                         rank_col="quota_rank")


def _cap_oracle() -> str:
    h = md5_long_duck(_KEY_D, CAP_SEED)
    return f"""
WITH r AS (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {h}, CAST(doc_id AS VARCHAR)) AS quota_rank
  FROM documents
)
SELECT doc_id, source, lang, CAST(quota_rank AS INTEGER) AS quota_rank
FROM r WHERE quota_rank <= {CAP_N}
"""


register(QuerySpec("cap_per_source", cap_per_source, _cap_oracle(),
                   tags=("LLM-sampling",)))


# --- temperature-scaled mixture weights ------------------------------------

# Multilingual sampling temperature (mT5 / XLM-R): q_s ∝ p_s^(1/T).
# T = 2 on purpose — the exponent becomes sqrt, which is IEEE-exact in
# both engines (a general pow() is libm-dependent and NOT cross-engine
# stable; other temperatures should quantize through the micro-ln
# BIGINT contract used by plans/ngram_lm.py).  The double sums go
# through DECIMAL(38,12) so normalization is order-independent.
TEMP_EPOCH_BUDGET = 100_000   # documents drawn per training epoch
TEMP_DECIMALS = 9


def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling weights under temperature T=2: raw share
    ``p``, tempered share ``q ∝ sqrt(n)``, the over/undersample factor
    ``q/p`` (the quantity mixture boosts low-resource sources by), and
    the expected docs drawn per epoch.  One aggregation over the corpus
    (map-side combined) + a 1-row broadcast of the totals: the output
    is |languages| rows at any corpus size."""
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("sq", F.sqrt(F.col("n_docs").cast("double")))
    )
    totals = counts.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.col("sq").cast("decimal(38,12)")).alias("sq_total"),
    )
    p = F.col("n_docs").cast("double") / F.col("n_total").cast("double")
    q = F.col("sq") / F.col("sq_total").cast("double")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "n_docs",
            F.round(p, TEMP_DECIMALS).alias("p_raw"),
            F.round(q, TEMP_DECIMALS).alias("q_tempered"),
            F.round(q / p, TEMP_DECIMALS).alias("boost"),
            F.round(q * TEMP_EPOCH_BUDGET, 0).cast("long")
            .alias("epoch_docs"),
        )
    )


MIXTURE_TEMPERATURE_ORACLE = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_docs, sqrt(CAST(COUNT(*) AS DOUBLE)) AS sq
  FROM documents GROUP BY lang
),
totals AS (
  SELECT SUM(n_docs) AS n_total,
         SUM(CAST(sq AS DECIMAL(38,12))) AS sq_total
  FROM counts
)
SELECT c.lang, CAST(c.n_docs AS BIGINT) AS n_docs,
       ROUND(CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE),
             {TEMP_DECIMALS}) AS p_raw,
       ROUND(c.sq / CAST(t.sq_total AS DOUBLE), {TEMP_DECIMALS})
         AS q_tempered,
       ROUND((c.sq / CAST(t.sq_total AS DOUBLE))
             / (CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE)),
             {TEMP_DECIMALS}) AS boost,
       CAST(ROUND(c.sq / CAST(t.sq_total AS DOUBLE)
                  * {TEMP_EPOCH_BUDGET}, 0) AS BIGINT) AS epoch_docs
FROM counts c CROSS JOIN totals t
"""

register(QuerySpec("mixture_temperature", mixture_temperature,
                   MIXTURE_TEMPERATURE_ORACLE, tags=("MIX",)))


# --- packing utilization evaluation ----------------------------------------


def packing_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-quality evaluation as a query: bins used, token
    utilization, and padding waste for the two committed greedy
    strategies (arrival order vs length-descending) at the same
    capacity — the measured answer to "is sorting worth the extra
    shuffle" (NFD needs a per-shard sort; the utilization delta is what
    pays for it).  One row per strategy; the pack runs are the registry
    operators themselves."""
    from star_schema_etl_airflow_spark.operators.packing import pack_greedy

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens_i", F.expr("(n_chars + 3) div 4")
    )

    def row(name: str, order: str | None) -> DataFrame:
        kw = {} if order is None else {"order": order}
        packed = pack_greedy(
            docs, "doc_id", "tokens_i", PACK_CAPACITY,
            n_shards=PACK_SHARDS, seed=PACK_SEED, **kw,
        )
        bins = packed.groupBy("shard").agg(
            (F.max("bin_id") + 1).alias("shard_bins")
        )
        return (
            packed.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("tokens").alias("total_tokens"),
            )
            .crossJoin(bins.agg(F.sum("shard_bins").alias("n_bins")))
            .select(
                F.lit(name).alias("strategy"),
                F.col("n_docs").cast("long").alias("n_docs"),
                F.col("n_bins").cast("long").alias("n_bins"),
                F.col("total_tokens").cast("long").alias("total_tokens"),
                F.round(
                    F.col("total_tokens").cast("double")
                    / (F.col("n_bins").cast("double") * PACK_CAPACITY),
                    9,
                ).alias("utilization"),
            )
        )

    return row("arrival", None).unionByName(row("length_desc", "tokens_desc"))


def _packing_eval_oracle() -> str:
    def chain(suffix: str, order_sql: str) -> str:
        return f"""seq{suffix} AS (
  SELECT shard, doc_id, tokens,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY {order_sql}) AS rn
  FROM base
), pack{suffix} AS (
  SELECT shard, doc_id, tokens, rn,
         CAST(0 AS INTEGER) AS bin_id, tokens AS fill
  FROM seq{suffix} WHERE rn = 1
  UNION ALL
  SELECT s.shard, s.doc_id, s.tokens, s.rn,
         CAST(CASE WHEN p.fill + s.tokens > {PACK_CAPACITY}
              THEN p.bin_id + 1 ELSE p.bin_id END AS INTEGER),
         CASE WHEN p.fill + s.tokens > {PACK_CAPACITY}
              THEN s.tokens ELSE p.fill + s.tokens END
  FROM pack{suffix} p JOIN seq{suffix} s
    ON s.shard = p.shard AND s.rn = p.rn + 1
)"""

    def summary(suffix: str, name: str) -> str:
        return f"""
  SELECT '{name}' AS strategy,
         CAST((SELECT COUNT(*) FROM pack{suffix}) AS BIGINT) AS n_docs,
         CAST((SELECT SUM(mb + 1) FROM (
            SELECT shard, MAX(bin_id) AS mb FROM pack{suffix} GROUP BY shard
         )) AS BIGINT) AS n_bins,
         CAST((SELECT SUM(tokens) FROM pack{suffix}) AS BIGINT)
           AS total_tokens,
         ROUND(CAST((SELECT SUM(tokens) FROM pack{suffix}) AS DOUBLE)
               / (CAST((SELECT SUM(mb + 1) FROM (
                    SELECT shard, MAX(bin_id) AS mb FROM pack{suffix}
                    GROUP BY shard)) AS DOUBLE) * {PACK_CAPACITY}),
               9) AS utilization"""

    return f"""
WITH RECURSIVE base AS (
  SELECT CAST({_bucket_duck(PACK_SEED)} % {PACK_SHARDS} AS INTEGER) AS shard,
         doc_id,
         CAST((n_chars + 3) // 4 AS INTEGER) AS tokens
  FROM documents
), {chain('1', 'doc_id')}, {chain('2', 'tokens DESC, doc_id')}
{summary('1', 'arrival')}
UNION ALL
{summary('2', 'length_desc')}
"""


register(QuerySpec("packing_eval", packing_eval, _packing_eval_oracle(),
                   tags=("PACK", "EVAL")))


# --- temperature-weight refresh after ingest --------------------------------


def mixture_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The action the drift monitor (``corpus_drift_psi``) triggers:
    recompute the T=2 tempered per-language weights on the post-ingest
    corpus and report the shift against the at-rest weights — the
    sampling-weight delta a training run picks up at its next epoch
    boundary.  Same sqrt/DECIMAL exactness contract as
    ``mixture_temperature``; two bucket-sized aggregations, one
    broadcast of each totals row."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")

    def tempered(rel: DataFrame, qname: str) -> DataFrame:
        counts = rel.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).withColumn("sq", F.sqrt(F.col("n").cast("double")))
        totals = counts.agg(
            F.sum(F.col("sq").cast("decimal(38,12)")).alias("sq_total")
        )
        return counts.crossJoin(F.broadcast(totals)).select(
            "lang",
            F.col("n").alias(f"n_{qname}"),
            F.round(
                F.col("sq") / F.col("sq_total").cast("double"),
                TEMP_DECIMALS,
            ).alias(f"q_{qname}"),
        )
    at_rest = tempered(docs.filter(F.col("doc_id") % 2 == 0), "at")
    union_all = tempered(docs, "union")
    return (
        at_rest.join(union_all, "lang")
        .select(
            "lang", "n_at", "n_union", "q_at", "q_union",
            F.round(F.col("q_union") - F.col("q_at"), TEMP_DECIMALS)
            .alias("q_shift"),
        )
    )


MIXTURE_REFRESH_ORACLE = f"""
WITH c_at AS (
  SELECT lang, COUNT(*) AS n, sqrt(CAST(COUNT(*) AS DOUBLE)) AS sq
  FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
),
t_at AS (
  SELECT SUM(CAST(sq AS DECIMAL(38,12))) AS sq_total FROM c_at
),
w_at AS (
  SELECT lang, n AS n_at,
         ROUND(sq / CAST(t.sq_total AS DOUBLE), {TEMP_DECIMALS}) AS q_at
  FROM c_at CROSS JOIN t_at t
),
c_u AS (
  SELECT lang, COUNT(*) AS n, sqrt(CAST(COUNT(*) AS DOUBLE)) AS sq
  FROM documents GROUP BY lang
),
t_u AS (
  SELECT SUM(CAST(sq AS DECIMAL(38,12))) AS sq_total FROM c_u
),
w_u AS (
  SELECT lang, n AS n_union,
         ROUND(sq / CAST(t.sq_total AS DOUBLE), {TEMP_DECIMALS}) AS q_union
  FROM c_u CROSS JOIN t_u t
)
SELECT a.lang,
       CAST(a.n_at AS BIGINT) AS n_at,
       CAST(u.n_union AS BIGINT) AS n_union,
       a.q_at, u.q_union,
       ROUND(u.q_union - a.q_at, {TEMP_DECIMALS}) AS q_shift
FROM w_at a JOIN w_u u ON a.lang = u.lang
"""

register(QuerySpec("mixture_refresh", mixture_refresh,
                   MIXTURE_REFRESH_ORACLE, tags=("MIX", "MONITORING")))
