"""Property-based tests for the chunking and quantization arithmetic.

The Spark expressions are differentially checked against DuckDB on the
fixtures; these pin the CLOSED-FORM math itself (python mirrors of the
exact same formulas) across the whole input space — lengths and values
the fixture never hits (0-length docs, huge docs, denormal floats).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, strategies as st

from star_schema_etl_airflow_spark.plans.llm_quantize import INT8_MAX


def _n_chunks(length: int, chunk: int, step: int) -> int:
    # python mirror of the Spark/DuckDB expression in plans/llm_text.py
    return max(1, math.ceil((length - chunk) / float(step)) + 1)


@given(
    st.integers(min_value=0, max_value=100_000),
    st.integers(min_value=2, max_value=512),
    st.integers(min_value=1, max_value=511),
)
def test_chunk_windows_tile_any_length(length, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    n = _n_chunks(length, chunk, step)
    starts = [1 + k * step for k in range(n)]
    ends = [min(length, s + chunk - 1) for s in starts]
    assert starts[0] == 1
    # last chunk reaches exactly the end (an empty doc yields one empty chunk)
    assert ends[-1] == length or (length == 0 and n == 1)
    # every non-final chunk is full width and overlaps the next by `overlap`
    for k in range(n - 1):
        assert ends[k] - starts[k] + 1 == chunk
        assert starts[k + 1] - starts[k] == step
        assert ends[k] >= starts[k + 1] - 1  # no gap
    # one more chunk would start past the end (no redundant trailing chunk)
    assert n == 1 or starts[-1] <= length


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=1, max_size=64,
    )
)
def test_quantize_codes_and_error_bound(vec):
    # python mirror of the quantize_int8 expressions
    x = np.asarray(vec, dtype=np.float64)
    amax = np.max(np.abs(x))
    scale = amax / INT8_MAX
    if scale == 0.0:
        codes = np.zeros_like(x)
        err = np.zeros_like(x)
    else:
        codes = np.floor(x / scale + 0.5)
        err = np.abs(x - codes * scale)
    assert np.all(codes >= -INT8_MAX) and np.all(codes <= INT8_MAX)
    # reconstruction error is at most half a quantization step (+ fp slack)
    assert np.all(err <= scale / 2 + 1e-9 * max(1.0, amax))
