"""Unrolled fixed-width vector expressions — the codegen fast path for
embedding math.

Spark's higher-order functions (``aggregate``/``zip_with``/``transform``)
are ``CodegenFallback`` expressions: every element evaluates its lambda
through the interpreted expression tree, so a 64-dim dot product costs
~128 boxed lambda invocations per row and drags the whole projection out
of whole-stage codegen.  For a FIXED, known dimensionality the same fold
can be emitted as a flat ``a[0]*b[0] + a[1]*b[1] + ...`` sum that
compiles into straight-line JVM arithmetic inside the codegen stage —
measured ~3-6x cheaper per row on the 64-wide fixture embeddings, and it
is the form a columnar engine would vectorize anyway.

Numeric contract (why results are bit-identical to the HOF fold):
- ``aggregate(..., 0.0, (acc, v) -> acc + v)`` evaluates
  ``((0.0 + v0) + v1) + ...``; the unrolled sum evaluates
  ``(v0 + v1) + ...``.  IEEE-754 ``0.0 + v == v`` for every v except
  that ``0.0 + (-0.0) == +0.0`` — and the only term that could differ is
  the FIRST one, whose sign of zero cannot propagate into a different
  rounded quotient (a later nonzero addend erases it; an all-zero sum
  feeds a 0/0 or 0/x quotient identical for both zero signs).  Every
  later addition associates identically (left fold either way).
- Integer sums (the JL fixed-point path) are exact under any
  association.

Precondition: the array columns really are ``dim`` wide.  Under ANSI
mode (Spark 4 default) an out-of-bounds ``a[d]`` throws rather than
padding NULL the way ``zip_with`` does — the fixture embeddings are
contractually ``EMB_DIM``-wide (TESTDATA.md), so the throw is the
correct behavior for malformed input, not a hazard.
"""

from __future__ import annotations

from typing import Sequence


def unrolled_dot(a: str, b: str, dim: int) -> str:
    """``sum_d cast(a[d] as double) * cast(b[d] as double)`` as a flat
    codegen-friendly sum (same left-to-right accumulation as the HOF
    fold it replaces)."""
    return " + ".join(
        f"cast({a}[{d}] as double) * cast({b}[{d}] as double)"
        for d in range(dim)
    )


def unrolled_dot_lits(a: str, lits: Sequence[float]) -> str:
    """Dot product against a compile-time constant vector, one scalar
    literal per term (a literal ``array(...)[d]`` form would constant-
    fold too, but bloats the expression text ~64x).

    Each element is coerced through ``float()`` before formatting:
    callers pass numpy rows, and under numpy>=2.0 ``repr(np.float64(x))``
    is ``'np.float64(x)'`` — unparseable SQL.
    """
    return " + ".join(
        f"cast({a}[{d}] as double) * cast({float(x)!r} as double)"
        for d, x in enumerate(lits)
    )


def unrolled_int_dot(a: str, b: str, dim: int) -> str:
    """Integer dot product of two integer-typed arrays, accumulated in
    BIGINT (exact under any association; the per-term casts also keep
    ANSI mode from overflowing a TINYINT*TINYINT product)."""
    return " + ".join(
        f"cast({a}[{d}] as bigint) * cast({b}[{d}] as bigint)"
        for d in range(dim)
    )


def unrolled_int_sqdist(a: str, b: str, dim: int) -> str:
    """Squared L2 distance of two integer-typed arrays, accumulated in
    BIGINT — exact under any association (the fixed-point kmeans‖ /
    IVF cell-assignment path)."""
    terms = []
    for d in range(dim):
        diff = f"(cast({a}[{d}] as bigint) - cast({b}[{d}] as bigint))"
        terms.append(f"{diff} * {diff}")
    return " + ".join(terms)


def unrolled_sqdist(a: str, b: str, dim: int) -> str:
    """Squared L2 distance, unrolled; term order and double accumulation
    match the ``aggregate(zip_with(...))`` left fold."""
    terms = []
    for d in range(dim):
        diff = f"(cast({a}[{d}] as double) - cast({b}[{d}] as double))"
        terms.append(f"{diff} * {diff}")
    return " + ".join(terms)


