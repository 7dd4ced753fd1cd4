"""Deduplication operators over the ``documents`` fixture: exact
(hash-groupBy), MinHash+LSH banding, SimHash hamming buckets, and direct
n-gram Jaccard — the LLM-training-data dedup family.

The fixture corpus has no duplicates, so every query runs over
``corpus`` = documents ∪ exact copies (every 10th doc, id+2_000_000)
∪ near-duplicates (every 5th doc with every 7th token dropped,
id+1_000_000).  Both engines build the corpus from the same parquet, so
the differential check covers the *whole* pipeline including candidate
generation.

Scale design (100 TB):
- exact dedup groups on a 60-bit content hash, never raw text — the
  shuffle key is 8 bytes/row.
- MinHash/SimHash candidate generation is bucket-partitioned (LSH bands /
  hamming bands): the only shuffles are (a) groupBy doc for signatures,
  (b) groupBy band-key for buckets, and only same-bucket pairs are
  Jaccard/hamming-verified — no all-pairs stage anywhere.
- signatures are fixed-width ints; the verify join re-reads only
  candidate docs' shingle sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    LSH_BAND_ROWS,
    N_MINHASH,
    SIMHASH_BAND_BITS,
    SIMHASH_BITS,
    char_ngrams_duck,
    char_ngrams_spark,
    jaccard_duck,
    jaccard_spark,
    md5_long_duck,
    md5_long_spark,
    shingle_hashes_duck,
    shingle_hashes_spark,
    shingles_duck,
    shingles_spark,
    tokens_duck,
    tokens_spark,
    uhash_min_duck,
    uhash_min_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.functions.caching import persist_once

# --- corpus with synthetic duplicates --------------------------------------

NEAR_DUP_OFFSET = 1_000_000
EXACT_DUP_OFFSET = 2_000_000

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duck("text")

# drop every 7th token (0-based index) — ~14% mutation
_MUTATE_S = f"array_join(filter({_TOKS_S}, (x, i) -> i % 7 != 0), ' ')"
_MUTATE_D = (
    f"array_to_string(list_transform("
    f"list_filter(range(0, len({_TOKS_D})), i -> i % 7 <> 0), "
    f"i -> ({_TOKS_D})[i + 1]), ' ')"
)


def build_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + EXACT_DUP_OFFSET).alias("doc_id"), "text")
    )
    near = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + NEAR_DUP_OFFSET).alias("doc_id"),
            F.expr(_MUTATE_S).alias("text"),
        )
    )
    # the fixture is one parquet file → 1 partition per union branch, which
    # serializes the (compute-heavy) hashing downstream; spread the rows
    # over every core first.  At scale the input arrives in many splits and
    # this repartition is dropped (it would be an unnecessary shuffle).
    n = spark.sparkContext.defaultParallelism
    return docs.unionByName(exact).unionByName(near).repartition(n, "doc_id")


CORPUS_DUCK = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {EXACT_DUP_OFFSET}, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + {NEAR_DUP_OFFSET}, {_MUTATE_D} FROM documents WHERE doc_id % 5 = 0
"""

# --- exact dedup: hash-groupBy ---------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on the 60-bit content hash, keep the lowest
    doc_id as canonical.  (Grouping on the hash, not the text, keeps the
    shuffle key fixed-width at scale; hash collisions are ~2^-30 at 1e9
    docs and a residual exact-text check can be added per group.)"""
    corpus = build_corpus(spark, sf_dir)
    return (
        corpus.select(F.expr(md5_long_spark("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


DEDUP_EXACT_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK})
SELECT {md5_long_duck('text')} AS content_hash,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_copies
FROM corpus
GROUP BY 1
"""

# --- MinHash + LSH banding -------------------------------------------------

_N_BANDS = N_MINHASH // LSH_BAND_ROWS
JACCARD_THRESHOLD = 0.5

_SH_S = shingles_spark(_TOKS_S)
_SH_D = shingles_duck(_TOKS_D)


def signature_of(docs: DataFrame) -> DataFrame:
    """MinHash signature relation for ANY (doc_id, text) input:
    doc_id, hashes (distinct hashed shingles), mh0..mh{N-1}.

    One md5 pass per shingle (``shingle_hashes``), then the N components
    are integer universal hashes over the pre-hashed array.  Only the
    int hashes travel downstream — the Jaccard verify compares hashed
    shingle sets (identical result modulo ~2^-30 collisions, same on
    both engines), so shuffles carry fixed-width ints, never the strings."""
    # single select (one analysis pass) — a 16-step withColumn chain costs
    # ~1.5s of repeated plan analysis for the same result.  Tokens are
    # projected into a column first: inlining split() into the shingle
    # lambda re-tokenizes per gram position (~4× slower — no CSE inside
    # lambda bodies).
    return docs.select(
        F.col("doc_id"), F.expr(_TOKS_S).alias("__t")
    ).select(
        F.col("doc_id"),
        F.expr(
            f"array_distinct({shingle_hashes_spark(shingles_spark('__t'))})"
        ).alias("hashes"),
    ).select(
        "doc_id",
        "hashes",
        *[F.expr(uhash_min_spark("hashes", j)).alias(f"mh{j}")
          for j in range(N_MINHASH)],
    )


def _signature_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signatures of the amplified fixture corpus (the self-join family)."""
    return signature_of(build_corpus(spark, sf_dir))


def band_buckets(sig: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) — the LSH banding of a signature
    relation; the shared candidate-generation front of every
    MinHash-family join (self-join, containment, delta-vs-corpus)."""
    band_exprs = []
    for b in range(_N_BANDS):
        row = ", ".join(
            f"mh{b * LSH_BAND_ROWS + r}" for r in range(LSH_BAND_ROWS)
        )
        band_exprs.append(f"{b}, md5(concat_ws(',', {row}))")
    return sig.select(
        "doc_id",
        F.expr(f"stack({_N_BANDS}, {', '.join(band_exprs)}) "
               "as (band_idx, band_key)"),
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: shingle → 16 minhashes → 4 bands of 4 →
    bucket-join on (band, band_key) → exact-Jaccard verify ≥ 0.5.

    The signature relation feeds both sides of the bucket self-join AND
    the verify joins; without a persist Spark recomputes the shingle+hash
    projection four times (Catalyst reuses exchanges, not arbitrary
    subtrees).  At 100 TB the signature table would be a materialized
    intermediate (write once, read four times) for the same reason."""
    sig = persist_once(_signature_df(spark, sf_dir))
    buckets = band_buckets(sig)

    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    sh = sig.select("doc_id", "hashes")
    return (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(jaccard_spark("sa.hashes", "sb.hashes")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _duck_minhash_sig(src: str = "corpus", name: str = "sigh") -> str:
    """Signature CTE pair over any (doc_id, text) relation ``src`` —
    the SQL twin of :func:`signature_of`."""
    mh = ",\n         ".join(
        f"{uhash_min_duck('hashes', j)} AS mh{j}" for j in range(N_MINHASH)
    )
    return f"""
{name}_sets AS (
  SELECT doc_id, list_distinct({shingle_hashes_duck(_SH_D)}) AS hashes
  FROM {src}
),
{name} AS (
  SELECT doc_id, hashes,
         {mh}
  FROM {name}_sets
)"""


def _duck_bands(name: str = "sigh") -> str:
    """Band-bucket UNION over a signature CTE — the SQL twin of
    :func:`band_buckets`."""
    parts = []
    for b in range(_N_BANDS):
        row = " || ',' || ".join(
            f"mh{b * LSH_BAND_ROWS + r}" for r in range(LSH_BAND_ROWS)
        )
        parts.append(
            f"SELECT doc_id, {b} AS band_idx, md5({row}) AS band_key "
            f"FROM {name}"
        )
    return "\nUNION ALL\n".join(parts)


DEDUP_MINHASH_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK}),
{_duck_minhash_sig()},
buckets AS (
{_duck_bands()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       {jaccard_duck('sa.hashes', 'sb.hashes')} AS jaccard
FROM cand c
JOIN sigh sa ON c.doc_a = sa.doc_id
JOIN sigh sb ON c.doc_b = sb.doc_id
WHERE {jaccard_duck('sa.hashes', 'sb.hashes')} >= {JACCARD_THRESHOLD}
"""

# --- SimHash hamming buckets -----------------------------------------------

HAMMING_THRESHOLD = 4
_N_SIM_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS


def simhash_relation(corpus: DataFrame) -> DataFrame:
    """(doc_id, simhash) — the 48-bit frequency-weighted simhash of any
    (doc_id, text) relation (shared by the dedup join and its eval)."""
    tok = corpus.select(
        "doc_id", F.explode(F.expr(_TOKS_S)).alias("tok")
    ).withColumn("h", F.expr(md5_long_spark("tok")))

    bit_sums = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {i}) & 1) = 1"), 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    sim_expr = " + ".join(
        f"(case when b{i} > 0 then {1 << i}L else 0L end)" for i in range(SIMHASH_BITS)
    )
    return (
        tok.groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", F.expr(sim_expr).alias("simhash"))
    )


def simhash_banded_pairs(sim: DataFrame) -> DataFrame:
    """The banded candidate join + hamming verify over a (doc_id,
    simhash) relation — ``dedup_simhash``'s discovery path, exposed for
    the eval."""
    band_exprs = ", ".join(
        f"{k}, shiftright(simhash, {k * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1}"
        for k in range(_N_SIM_BANDS)
    )
    buckets = sim.select(
        "doc_id",
        "simhash",
        F.expr(f"stack({_N_SIM_BANDS}, {band_exprs}) as (band_idx, band_key)"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= HAMMING_THRESHOLD)
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 48-bit frequency-weighted simhash per doc,
    bucket on 4 12-bit bands, verify hamming distance ≤ 4 on candidates."""
    return simhash_banded_pairs(
        simhash_relation(build_corpus(spark, sf_dir))
    )


def _duck_simhash() -> str:
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
tok AS (
  SELECT doc_id, {md5_long_duck('tok')} AS h
  FROM (SELECT doc_id, unnest({_TOKS_D}) AS tok FROM corpus)
),
bits AS (
  SELECT doc_id,
         {bit_sums}
  FROM tok GROUP BY doc_id
),
sim AS (
  SELECT doc_id, {sim_expr} AS simhash FROM bits
)"""


def _duck_sim_bands() -> str:
    parts = [
        f"SELECT doc_id, simhash, {k} AS band_idx, "
        f"(simhash >> {k * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1} AS band_key "
        f"FROM sim"
        for k in range(_N_SIM_BANDS)
    ]
    return "\nUNION ALL\n".join(parts)


DEDUP_SIMHASH_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK}),
{_duck_simhash()},
buckets AS (
{_duck_sim_bands()}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM buckets a JOIN buckets b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_THRESHOLD}
"""

# --- direct n-gram Jaccard on known orig↔mutant pairs ----------------------

_CG_S_A = char_ngrams_spark("a.text")
_CG_S_B = char_ngrams_spark("b.text")
_CG_D_A = char_ngrams_duck("a.text")
_CG_D_B = char_ngrams_duck("b.text")


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise similarity scoring: char-4-gram and word-3-gram Jaccard for
    each original↔mutant pair (the scoring kernel the LSH pipelines verify
    with, exposed standalone)."""
    corpus = build_corpus(spark, sf_dir)
    orig = corpus.filter(F.col("doc_id") < NEAR_DUP_OFFSET).alias("a")
    mut = corpus.filter(
        (F.col("doc_id") >= NEAR_DUP_OFFSET) & (F.col("doc_id") < EXACT_DUP_OFFSET)
    ).alias("b")
    pairs = orig.join(
        mut, F.col("a.doc_id") == F.col("b.doc_id") - NEAR_DUP_OFFSET
    )
    return pairs.select(
        F.col("a.doc_id").alias("orig_id"),
        F.col("b.doc_id").alias("dup_id"),
        F.expr(jaccard_spark(_CG_S_A, _CG_S_B)).alias("jaccard_char4"),
        F.expr(
            jaccard_spark(
                shingles_spark(tokens_spark("a.text")),
                shingles_spark(tokens_spark("b.text")),
            )
        ).alias("jaccard_word3"),
    )


NGRAM_JACCARD_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK})
SELECT a.doc_id AS orig_id,
       b.doc_id AS dup_id,
       {jaccard_duck(_CG_D_A, _CG_D_B)} AS jaccard_char4,
       {jaccard_duck(shingles_duck(tokens_duck('a.text')), shingles_duck(tokens_duck('b.text')))} AS jaccard_word3
FROM corpus a
JOIN corpus b ON a.doc_id = b.doc_id - {NEAR_DUP_OFFSET}
WHERE a.doc_id < {NEAR_DUP_OFFSET}
  AND b.doc_id >= {NEAR_DUP_OFFSET} AND b.doc_id < {EXACT_DUP_OFFSET}
"""

# --- cluster resolution: pairs → connected components ----------------------


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution: MinHash-LSH pairs → connected
    components → ``(doc_id, cluster_id)`` with cluster_id = smallest doc
    id in the transitive cluster (the canonical document).  Singletons
    (docs with no near-dup) are their own cluster, so this relation IS
    the keep-one-per-cluster dedup verdict: keep rows where
    ``doc_id = cluster_id``."""
    from star_schema_etl_airflow_spark.operators.components import (
        connected_components,
    )

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    corpus_ids = build_corpus(spark, sf_dir).select(F.col("doc_id").alias("node"))
    comp = connected_components(pairs, "doc_a", "doc_b", nodes=corpus_ids)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE corpus AS ({CORPUS_DUCK}),
{_duck_minhash_sig()},
buckets AS (
{_duck_bands()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sigh sa ON c.doc_a = sa.doc_id
  JOIN sigh sb ON c.doc_b = sb.doc_id
  WHERE {jaccard_duck('sa.hashes', 'sb.hashes')} >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM corpus
  UNION
  SELECT e.b AS node, reach.r AS r
  FROM reach JOIN edges e ON reach.node = e.a
)
SELECT node AS doc_id, MIN(r) AS cluster_id
FROM reach
GROUP BY node
"""

register(QuerySpec("dedup_exact", dedup_exact, DEDUP_EXACT_ORACLE,
                   tags=("LLM-dedup",)))
register(QuerySpec("dedup_minhash_lsh", dedup_minhash_lsh, DEDUP_MINHASH_ORACLE,
                   headline=True, tags=("LLM-dedup",)))
register(QuerySpec("dedup_simhash", dedup_simhash, DEDUP_SIMHASH_ORACLE,
                   tags=("LLM-dedup",)))
register(QuerySpec("ngram_jaccard", ngram_jaccard, NGRAM_JACCARD_ORACLE,
                   tags=("LLM-dedup",)))
register(QuerySpec("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_ORACLE,
                   tags=("LLM-dedup", "components")))


def dedup_clusters_bigstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_clusters`` resolved with large-star/small-star
    contraction (Kiveris et al., KDD 2014; ``operators/
    components.big_star_components``) instead of min-label
    propagation: O(log² n) rounds regardless of component DIAMETER —
    the robustness form for adversarial long-chain graphs.  Same
    oracle verbatim: the two algorithms must agree bucket-for-bucket
    on the real LSH pair graph."""
    from star_schema_etl_airflow_spark.operators.components import (
        big_star_components,
    )

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    corpus_ids = build_corpus(spark, sf_dir).select(F.col("doc_id").alias("node"))
    comp = big_star_components(pairs, "doc_a", "doc_b", nodes=corpus_ids)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


register(QuerySpec("dedup_clusters_bigstar", dedup_clusters_bigstar,
                   DEDUP_CLUSTERS_ORACLE,
                   tags=("LLM-dedup", "components")))


# --- prefix-filtered set-similarity join (AllPairs/PPJoin-lite) ------------

PREFIX_T_NUM, PREFIX_T_DEN = 9, 10  # Jaccard threshold 0.9, exact rational

# Estimated corpus bytes above which prefix_join_candidates pins the
# candidate-join parallelism (see the sizing note inside) — sf0.1's
# estimate is 0.73 MiB, the ×4 deep corpus 2.9 MiB; the measured
# crossover sits between them.
FANOUT_PIN_BYTES = 2 * 1024 * 1024


def dedup_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL pairs with word-set Jaccard >= 0.9 via prefix filtering — the
    exact-recall alternative to MinHash-LSH (no probabilistic misses).

    AllPairs invariant: order every doc's distinct tokens globally by
    (document-frequency asc, token), keep only the first
    ``n - ceil(t*n) + 1`` tokens (the prefix); two sets with Jaccard >= t
    MUST share a prefix token, so joining on prefix tokens generates a
    candidate superset, and the exact Jaccard verify makes the result
    exact.  Ordering rare-tokens-first minimizes candidate fan-out.

    The threshold is the rational 9/10 and the prefix length is computed
    in INTEGER arithmetic (``n - (9n+9) div 10 + 1``) — a float
    ``ceil(0.9*n)`` is an off-by-one trap at exact multiples.

    Candidate pruning is full PPJoin (Xiao et al. 2008), not bare
    AllPairs: besides the prefix theorem, every candidate row must pass
    the LENGTH filter (J >= t needs overlap o >= ceil(9(na+nb)/19), and
    o <= min(na, nb)) and the POSITIONAL filter (tokens sorted in one
    global (df, tok) order on both sides, so a token shared at sorted
    positions pa/pb bounds the overlap by
    min(pa-1, pb-1) + 1 + min(na-pa, nb-pb)).  Both are upper-bound
    prunes — the exact Jaccard verify still decides membership, so the
    result is exact.  The length filter additionally rides the JOIN KEY
    as a power-of-2 length bucket (see ``prefix_join_candidates``), and
    the verify computes |A∪B| as na + nb - o from the persisted set
    sizes instead of materializing ``array_union`` per pair.

    On this fixture's degenerate 31-token vocabulary the bare prefix
    join emits 37M candidate rows for 6.5k docs (worse than brute
    force); pruning cuts that to 5.6M distinct candidates at sf0.1 —
    against 1.44M TRUE pairs, i.e. the fixture corpus is genuinely
    ~quadratically self-similar and the query is output-bound
    (215s bare → ~6s pruned).  A Zipfian web corpus prunes orders of
    magnitude harder AND has near-linear true output.

    Scale: token DF is one aggregate; candidate generation shuffles on
    (token, length-bucket); the verify carries the token sets only for
    surviving candidates.

    Verify-stage plan pinning (r13 verdict task 4 — this query's
    recorded bench figure swung 1.5–5.7 s SAME-CODE across quiet runs,
    costing an A/B adjudication cycle every round): the swing was
    AQE re-planning the two verify joins run-to-run from borderline
    runtime stats (5.6 M candidate rows against a 6.5 k-doc token-set
    relation at sf0.1).  Below the ``FANOUT_PIN_BYTES`` corpus seam —
    the same probe the candidate stage uses — the token-set sides are
    explicitly BROADCAST (measured 6× verify spread → 1.5× and ~2×
    faster median; the relation is doc-count-sized with ≤31-int
    arrays, trivially broadcastable at any SF below the seam).  Above
    the seam toks is corpus-sized, so broadcast would be a
    scale-killer: the candidates repartition to an explicit
    pair-derived width instead (user-specified width, which AQE
    respects), the same pinning the candidate stage applies there."""
    toks, cands = prefix_join_candidates(spark, sf_dir)
    from star_schema_etl_airflow_spark.operators.scd2 import (
        _estimated_bytes,
    )

    small_corpus = _estimated_bytes(
        build_corpus(spark, sf_dir)
    ) <= FANOUT_PIN_BYTES
    if not small_corpus:
        cands = cands.repartition(
            spark.sparkContext.defaultParallelism * 2, "id_a"
        )
    sa = toks.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"),
                     F.col("n").alias("na"))
    sb = toks.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"),
                     F.col("n").alias("nb"))
    if small_corpus:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    # J = o / (na + nb - o): one array_intersect per candidate, reusing
    # the persisted set sizes — array_union would rebuild a hash set per
    # row just to count it; |A∪B| = na + nb - o is the same integer, so
    # the double quotient is bit-identical to jaccard_spark's.
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("o", F.expr("size(array_intersect(sa, sb))"))
        .withColumn(
            "jaccard",
            F.col("o").cast("double")
            / (F.col("na") + F.col("nb") - F.col("o")).cast("double"),
        )
        .filter(F.col("jaccard") >= PREFIX_T_NUM / PREFIX_T_DEN)
        .select("id_a", "id_b", "jaccard")
    )


def prefix_join_candidates(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """``(toks, cands)`` — the corpus as per-doc sorted INT token-id
    sets (``s``: dense ids in global (df, token) order, ``n``: set
    size) and the PPJoin-pruned candidate pairs BEFORE exact
    verification.  Exposed separately so ``tools/scale_curve.py`` can
    measure the candidate-ROW curve across scale factors: the pruning
    power is the operator's whole scale story, and a wall-time curve
    alone would hide a pruning regression behind shuffle noise.

    Contract note: ``toks`` covers NON-EMPTY documents only — a doc
    whose token set is empty vanishes at the explode (the historical
    string-set relation carried it with ``s=[], n=0``).  Output is
    unaffected (an n=0 doc can never pass the prefix filter or reach
    the Jaccard threshold), but a future consumer wanting one row per
    corpus doc must left-join back to the corpus doc_ids with coalesced
    empty sets."""
    from pyspark.sql import Window

    corpus = build_corpus(spark, sf_dir)
    toks_raw = corpus.select(
        "doc_id",
        F.expr(f"array_distinct({tokens_spark('text')})").alias("st"),
    ).withColumn("n", F.expr("size(st)"))

    flat = toks_raw.select("doc_id", "n", F.explode("st").alias("tok"))
    tok_df = flat.groupBy("tok").agg(F.count("*").alias("df"))

    # Dense integer token ids in GLOBAL (df asc, token) order — the
    # PPJoin canonical order — so (a) prefix position is row_number by
    # tid, and (b) the exact verify intersects INT arrays instead of
    # string arrays (a bijection on the vocabulary: intersection and
    # union cardinalities, hence Jaccard, are unchanged).  At ×8 of
    # sf0.1 the string-array verify over 44M candidates hashed ~2.7B
    # strings and dominated wall time (95s → ~3x faster on int ids).
    # The id assignment is a global window over the VOCABULARY relation
    # (tiny next to the corpus even at web scale; a 100 TB deployment
    # materializes this dictionary once and bucket-joins it).
    tok_ids = tok_df.withColumn(
        "tid",
        F.row_number().over(Window.orderBy("df", "tok")),
    ).select("tok", "tid")
    # tokens-sized relation feeding BOTH the per-doc id-set rebuild and
    # the prefix extraction — persist so the dictionary join runs once
    flati = persist_once(
        flat.join(F.broadcast(tok_ids), "tok").select("doc_id", "n", "tid")
    )

    # per-doc sorted int-id sets for the verify (both join sides)
    toks = persist_once(
        flati.groupBy("doc_id").agg(
            F.expr("sort_array(collect_list(tid))").alias("s")
        ).withColumn("n", F.expr("size(s)"))
    )

    w = Window.partitionBy("doc_id").orderBy("tid")
    prefix = (
        flati.withColumn("pos", F.row_number().over(w))
        .filter(
            F.col("pos")
            <= F.col("n")
            - ((F.lit(PREFIX_T_NUM) * F.col("n") + (PREFIX_T_DEN - 1))
               .cast("long") / PREFIX_T_DEN).cast("long")
            + 1
        )
        .select("doc_id", F.col("tid").alias("tok"), "pos", "n")
    )

    # LENGTH-BUCKET as part of the JOIN KEY, not only a post-join
    # predicate: Jaccard >= t constrains partner size to
    # nb in [ceil(t*na), floor(na/t)] (solve each branch of the
    # least(na,nb) >= o_req filter).  That band's ratio is 1/t^2 (1.23x
    # at t=0.9) < 2, so it spans at most TWO power-of-2 length buckets —
    # side a explodes over those (<= 2 rows, bounded for ANY document
    # length, unlike banding on exact length whose fan-out grows with
    # n), and the join runs on (tok, bucket).  The sort-merge join then
    # never materializes a pair from incompatible length buckets; the
    # exact length filter below still decides inside the shared bucket.
    # floor(log2(n)) is computed as length(bin(n)) - 1 — integer-exact,
    # immune to log()'s at-the-boundary rounding.
    bucket_of = "cast(length(bin(%s)) - 1 as int)"
    nb_lo = ((F.lit(PREFIX_T_NUM) * F.col("n") + (PREFIX_T_DEN - 1))
             .cast("long") / PREFIX_T_DEN).cast("long")
    nb_hi = ((F.lit(PREFIX_T_DEN) * F.col("n")).cast("long")
             / PREFIX_T_NUM).cast("long")
    a_exp = (
        prefix.withColumn("__lo", nb_lo).withColumn("__hi", nb_hi)
        .withColumn(
            "bkt",
            F.explode(F.sequence(
                F.expr(bucket_of % "__lo"), F.expr(bucket_of % "__hi")
            )),
        )
        .select("doc_id", "tok", "pos", "n", "bkt")
    )
    b_bkt = prefix.withColumn("bkt", F.expr(bucket_of % "n"))

    # o_req = ceil(9(na+nb)/19): the minimum overlap a Jaccard >= 9/10
    # pair must have (19o >= 9(na+nb), integer ceiling)
    o_req = (
        (F.lit(PREFIX_T_NUM) * (F.col("a.n") + F.col("b.n"))
         + (PREFIX_T_NUM + PREFIX_T_DEN - 1))
        .cast("long") / (PREFIX_T_NUM + PREFIX_T_DEN)
    ).cast("long")
    pos_bound = (
        F.least(F.col("a.pos") - 1, F.col("b.pos") - 1)
        + 1
        + F.least(F.col("a.n") - F.col("a.pos"),
                  F.col("b.n") - F.col("b.pos"))
    )
    # Candidate-join stage sizing.  AQE's byte-based coalescing sizes
    # this stage by its INPUT (a few MB of shuffled prefix tokens: the
    # 1 MB minPartitionSize floor coalesced the ×16 deep-curve cell to
    # 5 tasks) while the stage's cost is its OUTPUT fan-out (89M
    # candidate pairs at ×16: 120 of the cell's 161 s ran on 5 of 32
    # cores — profiled with tools/deep_profile.py).  The same
    # mis-sizing reproduces on a cluster, where shuffle.partitions
    # starts high and AQE coalesces the small exchange just as
    # aggressively — a byte floor can never see compute fan-out, so
    # above the threshold the operator (which knows it explodes) pins
    # its own width with an explicit key repartition on BOTH sides
    # (same keys + count → the join reuses the exchanges, no extra
    # shuffle): deep cells ×4/×8/×16 drop 26.9→15.1s / 36.6→17.7s /
    # 193→68s cold.  BELOW the threshold the plain join is kept: a
    # pinned repartition disables AQE's broadcast conversion and skew
    # split, and on the bench fixture's adversarial 31-token
    # vocabulary (one (tok,bkt) bucket carries most of the 5.6M
    # candidates) those mechanisms are worth 3× (1.5s AQE-managed vs
    # 4.9s pinned at sf0.1).  Real web-scale corpora sit on the pinned
    # side, where prefix tokens are rare-first and buckets are small
    # by construction.  The probe is Catalyst's zero-cost plan-stats
    # estimate (operators/scd2.py precedent).
    from star_schema_etl_airflow_spark.operators.scd2 import (
        _estimated_bytes,
    )

    if _estimated_bytes(corpus) > FANOUT_PIN_BYTES:
        fan_out = spark.sparkContext.defaultParallelism * 2
        a_exp = a_exp.repartition(fan_out, "tok", "bkt")
        b_bkt = b_bkt.repartition(fan_out, "tok", "bkt")
    cands = (
        a_exp.alias("a")
        .join(b_bkt.alias("b"), ["tok", "bkt"])
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.least(F.col("a.n"), F.col("b.n")) >= o_req)
            & (pos_bound >= o_req)
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    return toks, cands


DEDUP_PREFIX_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK}),
s AS (
  SELECT doc_id, list_distinct({tokens_duck('text')}) AS s FROM corpus
)
SELECT id_a, id_b, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         {jaccard_duck('a.s', 'b.s')} AS jaccard
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
WHERE jaccard >= {PREFIX_T_NUM} / {PREFIX_T_DEN}
"""

# headline (round-8 verdict task 3): this was the repo's slowest query
# (215s cold) until the PPJoin pruning rewrite — benching it per round
# keeps a pruning regression from going invisible.
register(QuerySpec("dedup_prefix_join", dedup_prefix_join,
                   DEDUP_PREFIX_ORACLE, headline=True,
                   tags=("LLM-dedup", "prefix-filter")))


# --- canonical selection: keep the best copy per near-dup cluster ----------


def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-decision that completes the dedup pipeline: per near-dup
    cluster, keep the HIGHEST-QUALITY copy (longest text; ties → lowest
    doc_id), not merely the lowest id.  Real curation keeps the best
    version of a page, which is rarely the first-crawled one.

    Shape: clusters (connected components) join per-doc quality, then an
    aggregatable argmax — ``min(struct(-quality, doc_id))`` — per
    cluster: map-side combine, one surviving row per cluster over the
    wire, same pattern as the k-means argmin (``operators/kmeans.py``)."""
    clusters = dedup_clusters(spark, sf_dir)
    quality = build_corpus(spark, sf_dir).select(
        "doc_id", F.length("text").alias("n_chars")
    )
    return (
        clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.min(F.struct((-F.col("n_chars")).alias("neg_q"), F.col("doc_id")))
            .alias("best"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "cluster_id",
            F.col("best.doc_id").alias("canonical_doc_id"),
            (-F.col("best.neg_q")).alias("canonical_chars"),
            "n_docs",
        )
    )


DEDUP_CANONICAL_ORACLE = f"""
WITH clusters AS (
{DEDUP_CLUSTERS_ORACLE}
),
corpus_q AS (
  SELECT doc_id, length(text) AS n_chars FROM ({CORPUS_DUCK})
),
j AS (
  SELECT c.cluster_id, c.doc_id, q.n_chars
  FROM clusters c JOIN corpus_q q USING (doc_id)
),
r AS (
  SELECT cluster_id, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_id) AS n_docs
  FROM j
)
SELECT cluster_id, doc_id AS canonical_doc_id,
       CAST(n_chars AS INTEGER) AS canonical_chars, n_docs
FROM r WHERE rn = 1
"""

register(QuerySpec("dedup_canonical", dedup_canonical,
                   DEDUP_CANONICAL_ORACLE, tags=("LLM-dedup",)))


# --- containment: asymmetric overlap (quote / subset detection) ------------

CONTAINMENT_THRESHOLD = 0.5


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup scoring: containment(A in B) =
    |shingles(A) ∩ shingles(B)| / |shingles(A)|.  Jaccard misses the
    quote/subset case (a short doc wholly contained in a long one has
    low Jaccard but containment ≈ 1); dedup policies drop the contained
    side.  Candidates come from the same LSH band buckets as the
    symmetric pass — one extra projection over machinery the Jaccard
    join already paid for; both directions emitted per pair."""
    sig = persist_once(_signature_df(spark, sf_dir))
    buckets = band_buckets(sig)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = sig.select("doc_id", "hashes")
    inter = "cast(size(array_intersect(sa.hashes, sb.hashes)) as double)"
    return (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"{inter} / cast(size(sa.hashes) as double)")
            .alias("contain_a_in_b"),
            F.expr(f"{inter} / cast(size(sb.hashes) as double)")
            .alias("contain_b_in_a"),
        )
        .filter(
            F.greatest("contain_a_in_b", "contain_b_in_a")
            >= CONTAINMENT_THRESHOLD
        )
    )


def _containment_oracle() -> str:
    return f"""
WITH corpus AS ({CORPUS_DUCK}),
{_duck_minhash_sig()},
buckets AS (
{_duck_bands()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, contain_a_in_b, contain_b_in_a FROM (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.hashes, sb.hashes)) AS DOUBLE)
           / CAST(len(sa.hashes) AS DOUBLE) AS contain_a_in_b,
         CAST(len(list_intersect(sa.hashes, sb.hashes)) AS DOUBLE)
           / CAST(len(sb.hashes) AS DOUBLE) AS contain_b_in_a
  FROM cand c
  JOIN sigh sa ON c.doc_a = sa.doc_id
  JOIN sigh sb ON c.doc_b = sb.doc_id
)
WHERE GREATEST(contain_a_in_b, contain_b_in_a) >= {CONTAINMENT_THRESHOLD}
"""


register(QuerySpec("dedup_containment", dedup_containment,
                   _containment_oracle(), tags=("LLM-dedup",)))


# --- duplication-aware soft reweighting (SoftDeDup) -------------------------

SOFT_SCALE = 1_000_000_000  # nano: prob resolution at corpus-sized n_clusters


def softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware SOFT reweighting instead of hard removal
    (He et al., "SoftDedup: an Efficient Data Reweighting Method for
    Speeding Up Language Model Pre-training", ACL 2024): every document
    stays in the corpus but its sampling weight is the inverse of its
    "commonness" — here the near-dup cluster size from the repo's
    MinHash-LSH transitive clusters, so a 5-way duplicated page
    contributes the same expected mass as one unique page.

    Exactness note: the normalized sampling probability needs
    Σ_docs (1/size_d), which is a FLOAT sum in general (order-dependent
    across engines) — but each cluster contributes size·(1/size) = 1,
    so the sum is EXACTLY the number of clusters, and
    prob_d = 1/(size_d · n_clusters) is a pure integer ratio: one
    double division and a round, bit-identical in both engines.

    Scale: one cluster-size aggregation over the (doc, cluster)
    relation, joined back on cluster_id; n_clusters is a broadcast
    1-row total."""
    clusters = dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    nc = sizes.agg(F.count(F.lit(1)).alias("n_clusters"))
    return (
        clusters.join(sizes, "cluster_id")
        .crossJoin(F.broadcast(nc))
        .select(
            "doc_id",
            "cluster_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.round(
                F.lit(float(SOFT_SCALE))
                / F.col("cluster_size").cast("double"), 0,
            ).cast("long").alias("weight_nano"),
            F.round(
                F.lit(float(SOFT_SCALE))
                / (F.col("cluster_size") * F.col("n_clusters"))
                .cast("double"), 0,
            ).cast("long").alias("prob_nano"),
        )
    )


SOFTDEDUP_ORACLE = f"""
WITH clusters AS ({DEDUP_CLUSTERS_ORACLE}),
sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM clusters GROUP BY 1
),
nc AS (SELECT COUNT(*) AS n_clusters FROM sizes)
SELECT c.doc_id, c.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(round({SOFT_SCALE}.0 / CAST(s.cluster_size AS DOUBLE))
            AS BIGINT) AS weight_nano,
       CAST(round({SOFT_SCALE}.0
                  / CAST(s.cluster_size * n.n_clusters AS DOUBLE))
            AS BIGINT) AS prob_nano
FROM clusters c JOIN sizes s USING (cluster_id) CROSS JOIN nc n
"""

register(QuerySpec("softdedup_weights", softdedup_weights,
                   SOFTDEDUP_ORACLE, tags=("LLM-dedup", "MIX")))
