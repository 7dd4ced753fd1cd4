"""Invariants for the acoustic-fingerprint near-dup join
(plans/audio_dedup.py) — the audio twin of tests/test_image_dedup.py:
gain invariance, bounded local-edit impact, pigeonhole-exact banding,
end-to-end equality with brute force.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.audio_dedup import (
    BAND_BITS,
    FP_BANDS,
    HAMMING_T,
    N_BASES,
    _fp_kernel,
    audio_dedup_fingerprint,
)

SF_DIR = "/root/testdata/sf0.001"


def _fp_of(doc_ids: list[int]) -> dict[int, tuple[int, ...]]:
    out = {}
    for pdf in _fp_kernel(iter([pd.DataFrame({"doc_id": doc_ids})])):
        for row in pdf.itertuples(index=False):
            out[row.doc_id] = (row.b0, row.b1, row.b2, row.b3)
    return out


def _hamming(a: tuple[int, ...], b: tuple[int, ...]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_uniform_gain_is_fingerprint_invariant():
    """gain multiplies every frame energy by gain², so every adjacent
    comparison — hence the fingerprint — is unchanged.  Pick id pairs
    sharing base and bump parity (doc_id % 5) but different gain."""
    # doc_id and doc_id + 5*N_BASES: same base, same %5 (5*37 ≡ 0 mod 5),
    # gain index differs by 5 % 3 = 2
    pairs = [(3, 3 + 5 * N_BASES), (11, 11 + 5 * N_BASES)]
    fp = _fp_of([i for p in pairs for i in p])
    for a, b in pairs:
        assert fp[a] == fp[b], (a, b)


def test_frame0_bump_flips_at_most_one_bit():
    """The +40 on frame 0 touches only the E(0)>E(1) comparison."""
    # same base + gain, different bump parity: doc_id = b vs
    # b + 3*N_BASES*5... simpler: find two ids with equal base, equal
    # gain index, different %5 — id and id + 6*N_BASES (6%3=0 keeps
    # gain; 6*37=222, 222%5=2 shifts bump parity for most b)
    for b in (0, 7, 13):
        other = b + 6 * N_BASES
        if (b % 5 == 0) == (other % 5 == 0):
            continue
        fp = _fp_of([b, other])
        assert _hamming(fp[b], fp[other]) <= 1, (b, other)


def test_distinct_motifs_are_not_one_bucket():
    fp = _fp_of(list(range(N_BASES)))
    near = sum(
        1
        for i in range(N_BASES)
        for j in range(i + 1, N_BASES)
        if _hamming(fp[i], fp[j]) <= HAMMING_T
    )
    assert near < N_BASES * (N_BASES - 1) // 4


def test_bands_cover_all_32_bits():
    assert FP_BANDS * BAND_BITS == 32


def test_end_to_end_pairs_match_brute_force(spark):
    from star_schema_etl_airflow_spark.plans.audio_dedup import (
        _fp_relation,
    )

    got = audio_dedup_fingerprint(spark, SF_DIR).collect()
    hashed = _fp_relation(spark, SF_DIR)
    a = hashed.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(FP_BANDS)],
    )
    b = hashed.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(FP_BANDS)],
    )
    ham = sum(
        F.expr(f"bit_count(a{k} ^ bb{k})") for k in range(FP_BANDS)
    )
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= HAMMING_T)
        .select("id_a", "id_b", "hamming")
        .collect()
    )
    key = lambda r: (r.id_a, r.id_b)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, brute))
    assert len(got) > 0
    assert all(r.id_a < r.id_b and r.hamming <= HAMMING_T for r in got)


@pytest.mark.parametrize("doc_id", [0, 1, 36, 37, 5555, 10**7 + 1])
def test_kernel_band_range(doc_id):
    fp = _fp_of([doc_id])[doc_id]
    assert all(0 <= x < (1 << BAND_BITS) for x in fp)


def test_plan_has_no_cartesian(spark):
    df = audio_dedup_fingerprint(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
