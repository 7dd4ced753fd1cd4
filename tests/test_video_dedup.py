"""Video temporal near-dup: frame-hash reference parity, brightness
invariance, temporal-offset tolerance, and the linear-growth guard on
the corpus-derived base count."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.image_dedup import (
    CELL,
    GRID_H,
    GRID_W,
)
from star_schema_etl_airflow_spark.plans.video_dedup import (
    VSEQ_DOC_MOD,
    VSEQ_MIN_FRAMES,
    VSEQ_SIM,
    VSEQ_VAR,
    _cell_base,
    _frame_motif,
    _synth_frame_png,
    video_frame_hashes,
    video_sequence_pairs,
    vseq_bases,
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_hash(doc_id: int, f: int, base_mod: int) -> str:
    """Closed-form dHash over the cell grid — the DuckDB oracle's
    formulation, independent of the PNG encode/decode path."""
    motif = _frame_motif(doc_id, f, base_mod)
    cells = [
        [_cell_base(motif, gx, gy) * CELL * CELL for gx in range(GRID_W)]
        for gy in range(GRID_H)
    ]
    # shift adds equally to all cells — dropped on purpose (invariant)
    bands = [0, 0, 0, 0]
    pos = 0
    for gy in range(GRID_H):
        for gx in range(GRID_W - 1):
            bit = 1 if cells[gy][gx] > cells[gy][gx + 1] else 0
            bands[pos // 16] |= bit << (pos % 16)
            pos += 1
    return "_".join(str(b) for b in bands)


def test_frame_hashes_match_closed_form_and_decode_path(spark):
    docs = spark.range(120).withColumnRenamed("id", "doc_id")
    bm = vseq_bases(120)
    got = {
        (r.doc_id, r.f): r.h
        for r in video_frame_hashes(docs, bm).collect()
    }
    for doc_id in range(0, 120, VSEQ_DOC_MOD):
        n = VSEQ_MIN_FRAMES + doc_id % VSEQ_VAR
        for f in range(n):
            assert got[(doc_id, f)] == _ref_hash(doc_id, f, bm), (doc_id, f)
    # shift really was applied to the pixels yet cancelled in the hash:
    # two same-base copies at different shifts (same copy-ordinal
    # parity, so same temporal offset) share every frame hash
    a, b = 0, 4 * bm       # ordinals 0 and 2: off equal, shift differs
    assert got[(a, 0)] == got[(b, 0)]
    # ordinals 0 and 1: temporal offset differs -> frame 0 differs but
    # frame 1 of the offset copy equals frame 2 of the aligned copy
    c = 2 * bm
    assert got[(0, 1)] == got[(c, 0)]
    assert got[(0, 0)] != got[(c, 0)]


def test_pairs_find_shifted_and_offset_copies(spark):
    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    bm = vseq_bases(200)
    pairs = {
        (r.vid_a, r.vid_b): r.sim
        for r in video_sequence_pairs(docs, bm).collect()
    }
    from star_schema_etl_airflow_spark.plans.video_dedup import (
        _copy_ordinal,
    )

    # doc 0 and doc 4*bm: same base, brightness-shifted, same offset
    # parity → near-identical shingle sets
    assert (0, 4 * bm) in pairs and pairs[(0, 4 * bm)] > 0.5
    # one-frame temporal offset (odd copy ordinal) still clears the
    # gate — interior shingles survive the shift
    found_offset_pair = any(
        s >= VSEQ_SIM
        and _copy_ordinal(a, bm) % 2 != _copy_ordinal(b, bm) % 2
        for (a, b), s in pairs.items()
    )
    assert found_offset_pair
    # precision: no cross-base pair sneaks in
    for (a, b) in pairs:
        assert a % bm == b % bm


def test_base_count_is_odd_and_scales(spark):
    assert vseq_bases(500) == 23
    assert vseq_bases(5000) == 227
    assert vseq_bases(2000) == 91        # 90 → 91: coprime with stride
    for n in (500, 2000, 5000, 16000):
        assert vseq_bases(n) % 2 == 1


def test_registered_query_nonempty_and_thresholded(spark):
    from star_schema_etl_airflow_spark.plans.video_dedup import (
        video_dedup_sequence,
    )

    df = video_dedup_sequence(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.sim >= VSEQ_SIM for r in rows)
    assert all(r.vid_a < r.vid_b for r in rows)


def test_incremental_recrawls_match_sources_fresh_match_nothing(spark):
    from star_schema_etl_airflow_spark.plans.video_dedup import (
        VDELTA_FRESH_OFFSET,
        VDELTA_RECRAWL_OFFSET,
        video_dedup_incremental,
    )

    rows = video_dedup_incremental(spark, SF_DIR).collect()
    assert rows
    matches: dict = {}
    for r in rows:
        matches.setdefault(r.delta_id, []).append((r.corpus_id, r.sim))
    # no fresh video matched anything
    assert not any(d >= VDELTA_FRESH_OFFSET for d in matches)
    # every re-ingested copy matched its own source (offset flipped,
    # brightness changed — the probe must still align it)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    recrawl_srcs = [
        r["doc_id"] for r in docs.select("doc_id").collect()
        if r["doc_id"] % 6 == 0 and r["doc_id"] % 2 == 0
    ]
    for src in recrawl_srcs:
        d = src + VDELTA_RECRAWL_OFFSET
        assert d in matches, src
        assert any(c == src for c, _s in matches[d]), src
