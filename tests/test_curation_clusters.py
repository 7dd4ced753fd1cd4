"""Cluster-integrity pins for the cross-modal transitive resolution
(plans/curation_clusters.py, r10 verdict task 7).

The oracle sweep checks equality against the recursive-closure twin;
these tests pin the PROPERTIES: the constructed media hash-round-trip
exactly (encode → production decode → hash recovers the target value),
the 2-hop cross-modal transitivity is real (bases 16j and 16j+2 share
no direct modality edge yet one cluster), and closure does NOT
collapse the corpus (the failure mode that keeps SimHash edges out of
this operator is measured and documented in the module).
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from star_schema_etl_airflow_spark.plans.audio_dedup import (
    HAMMING_T as AUD_T,
)
from star_schema_etl_airflow_spark.plans.audio_dedup import (
    fp_bands_from_wav,
)
from star_schema_etl_airflow_spark.plans.audio_dedup import (
    fp64_bands_from_wav,
)
from star_schema_etl_airflow_spark.plans.curation_clusters import (
    GROUP,
    _png_from_dhash,
    _wav_from_fp,
    _wav_from_fp64,
    curation_multimodal_clusters,
)
from star_schema_etl_airflow_spark.plans.image_dedup import (
    BAND_BITS as IMG_BAND_BITS,
)
from star_schema_etl_airflow_spark.plans.image_dedup import (
    HAMMING_T as IMG_T,
)
from star_schema_etl_airflow_spark.plans.image_dedup import (
    dhash_bands_from_png,
)

SF_DIR = "/root/testdata/sf0.001"


def _bands(h: int, band_bits: int, n: int = 4) -> tuple[int, ...]:
    return tuple((h >> (k * band_bits)) & ((1 << band_bits) - 1)
                 for k in range(n))


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 60) - 1))
def test_png_construction_round_trips_the_target_dhash(h):
    assert dhash_bands_from_png(_png_from_dhash(h)) == _bands(h, 16)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 32) - 1))
def test_wav_construction_round_trips_the_target_fingerprint(h):
    assert fp_bands_from_wav(_wav_from_fp(h)) == _bands(h, 8)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_wav64_construction_round_trips_the_wide_fingerprint(h):
    """The r12 audio identity key: full 64-bit encode → production
    decode → wide hash round-trip (closes the AUD_MASK birthday
    bound)."""
    assert fp64_bands_from_wav(_wav_from_fp64(h)) == _bands(h, 16)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_2hop_bases_share_no_direct_modality_edge():
    """Bases 16j and 16j+2: image keys differ (i{j} vs u{16j+2}), audio
    keys differ (w{16j} vs a{j}) — both md5-far apart, so the ONLY path
    between them is through 16j+1.  This is what makes the closure
    genuinely cross-modal, not a disguised single-modality grouping."""
    for j in (0, 1, 2):
        lo, hi = GROUP * j, GROUP * j + 2
        img_lo = _md5_60(f"i{j}")
        img_hi = _md5_60(f"u{hi}")
        aud_lo = _md5_60(f"w{lo}")  # full 60-bit keys since r12
        aud_hi = _md5_60(f"a{j}")
        assert _hamming(img_lo, img_hi) > IMG_T
        assert _hamming(aud_lo, aud_hi) > AUD_T


def test_cluster_integrity(spark):
    df = curation_multimodal_clusters(spark, SF_DIR).cache()
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in df.collect()}

    # every corpus doc labeled exactly once
    assert len(rows) == df.count()

    # cluster_id is the smallest member doc_id
    by_cluster: dict[int, list[int]] = {}
    for doc, (cid, _) in rows.items():
        by_cluster.setdefault(cid, []).append(doc)
    for cid, members in by_cluster.items():
        assert cid == min(members), (cid, min(members))

    # cluster_size is consistent with the actual member count
    for doc, (cid, size) in rows.items():
        assert size == len(by_cluster[cid]), (doc, cid)

    # 2-hop cross-modal transitivity: 16j ~img~ 16j+1 ~aud~ 16j+2
    for j in (0, 1, 2):
        b0, b1, b2 = GROUP * j, GROUP * j + 1, GROUP * j + 2
        assert rows[b0][0] == rows[b1][0] == rows[b2][0], (
            f"neighborhood {j} not merged")

    # copies ride their base's cluster (identical text + same assets)
    assert rows[1_000_000][0] == rows[0][0]
    assert rows[2_000_000][0] == rows[0][0]

    # and closure does NOT collapse the corpus: identity edges only
    # (exact text, identical assets) keep clusters neighborhood-sized
    assert max(s for _, s in rows.values()) <= 20
    assert len(by_cluster) > len(rows) // 3


def test_plan_has_no_cartesian(spark):
    plan = curation_multimodal_clusters(
        spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # broadcast nested loop is acceptable only for 1-row scalar sides;
    # this plan should have none at all
    assert "BroadcastNestedLoopJoin" not in plan
