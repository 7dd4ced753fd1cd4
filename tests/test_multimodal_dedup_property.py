"""Property tests: the image/audio fingerprint kernels equal an
INDEPENDENT pure-Python evaluation of the closed-form formulas the
DuckDB oracles state.

The oracle sweep proves Spark == DuckDB; these prove kernel == formula
without either engine — so a bug cannot survive by mutating kernel and
oracle in lockstep (the codec fuzz-pinning precedent, tests/test_*_fuzz).
The evaluators below are deliberately written from the FORMULA (module
docstrings), not by calling any kernel helper.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from star_schema_etl_airflow_spark.plans import audio_dedup as aud
from star_schema_etl_airflow_spark.plans import image_dedup as img

doc_ids = st.integers(min_value=0, max_value=2**40)


def _img_bands_from_formula(doc_id: int) -> tuple[int, ...]:
    base, shift = doc_id % 41, (doc_id // 41) % 17
    bump = 30 if doc_id % 3 == 0 else 0

    def cell(gx: int, gy: int) -> int:
        v = (base * 7 + gx * 13 + gy * 29) % 200 + shift
        if gx == 0 and gy == 0:
            v += bump
        return 4 * v  # 2×2 block of identical pixels

    bits = [
        1 if cell(gx, gy) > cell(gx + 1, gy) else 0
        for gy in range(8)
        for gx in range(8)
    ]
    return tuple(
        sum(bits[k * 16 + i] << i for i in range(16)) for k in range(4)
    )


def _aud_bands_from_formula(doc_id: int) -> tuple[int, ...]:
    base, gain = doc_id % 37, 1 + (doc_id // 37) % 3
    bump = 40 if doc_id % 5 == 0 else 0

    def sample(i: int) -> int:
        s = gain * (((base * 13 + (i // 8) * 37 + (i % 8) * 5) % 97) - 48)
        return s + (bump if i < 8 else 0)

    energy = [
        sum(sample(f * 8 + j) ** 2 for j in range(8)) for f in range(33)
    ]
    bits = [1 if energy[f] > energy[f + 1] else 0 for f in range(32)]
    return tuple(
        sum(bits[k * 8 + i] << i for i in range(8)) for k in range(4)
    )


def _kernel_bands(kernel, doc_id: int) -> tuple[int, ...]:
    for pdf in kernel(iter([pd.DataFrame({"doc_id": [doc_id]})])):
        r = next(pdf.itertuples(index=False))
        return (r.b0, r.b1, r.b2, r.b3)


@settings(max_examples=60, deadline=None)
@given(doc_ids)
def test_image_kernel_matches_closed_form(doc_id):
    assert _kernel_bands(img._dhash_kernel, doc_id) \
        == _img_bands_from_formula(doc_id)


@settings(max_examples=60, deadline=None)
@given(doc_ids)
def test_audio_kernel_matches_closed_form(doc_id):
    assert _kernel_bands(aud._fp_kernel, doc_id) \
        == _aud_bands_from_formula(doc_id)
