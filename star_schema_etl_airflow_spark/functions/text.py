"""Text-pipeline primitives: tokenization, shingling, hashing, MinHash,
SimHash — as paired Spark/DuckDB SQL expression builders.

These power the LLM-training-data operators (dedup, fingerprinting, text
stats) that extend the reference's surface.  Everything is built from
engine built-ins (no Python UDFs): expressions stay inside whole-stage
codegen on the Spark side and are exactly reproducible on the DuckDB
oracle side.

Hash parity: both engines expose bit-identical ``md5`` over UTF-8
strings; ``md5_long`` takes the first 15 hex chars (60 bits, always
positive in an int64) as the integer hash.  Production note: at 100 TB
``xxhash64`` (Spark built-in) is ~10× cheaper than md5 — the md5 choice
here is for cross-engine differential testing; swap ``HASH_SPARK``
in one place to switch.

Scale design: every operator built on these primitives is
bucket-partitioned (hash/band keys), never all-pairs — candidate
generation is a shuffle on short band-hash keys, and only same-bucket
pairs are verified.
"""

from __future__ import annotations

# Shared knobs (both engines derive from these so they cannot drift).
N_MINHASH = 16        # minhash signature length
LSH_BAND_ROWS = 4     # rows per band → N_MINHASH/LSH_BAND_ROWS bands
SHINGLE_N = 3         # word n-gram size for shingles
SIMHASH_BITS = 48      # simhash width (48 of the hash's 60 bits; fits BIGINT)
SIMHASH_BAND_BITS = 12  # simhash bucket bands (4 bands of 12 bits)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

# --- paired expression templates (s: Spark SQL, d: DuckDB SQL) -------------


def md5_long_spark(expr: str, seed: str | None = None) -> str:
    src = f"concat('{seed}', ':', {expr})" if seed is not None else expr
    return f"cast(conv(substring(md5({src}), 1, 15), 16, 10) as bigint)"


def md5_long_duck(expr: str, seed: str | None = None) -> str:
    src = f"('{seed}' || ':' || {expr})" if seed is not None else expr
    return f"CAST(('0x' || substr(md5({src}), 1, 15)) AS BIGINT)"


def let_spark(value: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate ``value`` ONCE, bind it to ``var``, and
    evaluate ``body`` (which references ``var``).

    Implemented as ``transform(array(value), var -> body)[0]``.  Use it
    whenever an expensive expression (typically the tokenizer split)
    would otherwise be spliced into a per-element lambda body — Spark
    performs no common-subexpression elimination across lambda
    invocations, so an inline splice re-evaluates per element (the
    O(n²)-per-document trap documented in plans/ngram_lm.py and fixed
    in shingles_spark/positional_gram_hashes).  ``var`` must be unique
    within the enclosing expression tree."""
    return f"transform(array({value}), {var} -> {body})[0]"


def tokens_spark(expr: str) -> str:
    return f"split({expr}, '\\\\s+')"


def tokens_duck(expr: str) -> str:
    return f"string_split_regex({expr}, '\\s+')"


def shingles_spark(toks: str, n: int = SHINGLE_N) -> str:
    """Distinct word n-grams of a token array (docs shorter than n collapse
    to one whole-doc shingle).

    ``toks`` is bound ONCE through a one-element-array lambda: splicing
    it inline would re-evaluate it per gram position inside the
    position lambda (Spark does no CSE across lambda invocations) —
    quadratic when ``toks`` is itself the tokenizer split."""
    return (
        f"transform(array({toks}), __sh -> "
        f"array_distinct(case when size(__sh) < {n} "
        f"then array(array_join(__sh, ' ')) "
        f"else transform(sequence(0, size(__sh) - {n}), "
        f"i -> array_join(slice(__sh, i + 1, {n}), ' ')) end))[0]"
    )


def shingles_duck(toks: str, n: int = SHINGLE_N) -> str:
    return (
        f"list_distinct(CASE WHEN len({toks}) < {n} "
        f"THEN [array_to_string({toks}, ' ')] "
        f"ELSE list_transform(range(0, len({toks}) - {n} + 1), "
        f"i -> array_to_string({toks}[i + 1 : i + {n}], ' ')) END)"
    )


def char_ngrams_spark(expr: str, n: int = 4) -> str:
    return (
        f"array_distinct(case when length({expr}) < {n} then array({expr}) "
        f"else transform(sequence(0, length({expr}) - {n}), "
        f"i -> substring({expr}, i + 1, {n})) end)"
    )


def char_ngrams_duck(expr: str, n: int = 4) -> str:
    return (
        f"list_distinct(CASE WHEN length({expr}) < {n} THEN [{expr}] "
        f"ELSE list_transform(range(0, length({expr}) - {n} + 1), "
        f"i -> substr({expr}, i + 1, {n})) END)"
    )


def minhash_spark(shingles: str, seed: int) -> str:
    """One minhash component: min over shingles of the seeded hash.
    (Used where only a single component is needed, e.g. fingerprints;
    signature pipelines use the universal-hash family below so the
    expensive md5 runs once per shingle, not once per (shingle, seed).)"""
    return f"array_min(transform({shingles}, s -> {md5_long_spark('s', str(seed))}))"


def minhash_duck(shingles: str, seed: int) -> str:
    return f"list_min(list_transform({shingles}, s -> {md5_long_duck('s', str(seed))}))"


# Universal-hash minhash family: h_j(x) = (a_j * (md5(x) mod M) + b_j) mod P.
# One md5 per shingle; the N_MINHASH components are integer arithmetic over
# the pre-hashed array — ~16× fewer md5 evaluations, identical collision
# behavior.  M = 2^30-ish prime keeps a_j * h < 2^61 (no int64 overflow, so
# Spark and DuckDB agree exactly; DuckDB errors on overflow, Spark wraps).
UHASH_M = 1073741789          # largest prime < 2^30
UHASH_P = 2147483647          # 2^31 - 1 (Mersenne)
_RNG_A = 1103515245           # LCG multiplier/increment (public constants)
_RNG_C = 12345


def _uhash_params(n: int = N_MINHASH) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs via a tiny LCG — no RNG import, and
    both engines' SQL is generated from the same values."""
    params, x = [], 20240813
    for _ in range(n):
        x = (_RNG_A * x + _RNG_C) % UHASH_P
        a = x % (UHASH_M - 1) + 1
        x = (_RNG_A * x + _RNG_C) % UHASH_P
        b = x % UHASH_P
        params.append((a, b))
    return params


UHASH_PARAMS = _uhash_params()


def shingle_hashes_spark(shingles: str) -> str:
    """Pre-hashed shingle array (the single md5 pass)."""
    return f"transform({shingles}, s -> {md5_long_spark('s')} % {UHASH_M})"


def shingle_hashes_duck(shingles: str) -> str:
    return f"list_transform({shingles}, s -> {md5_long_duck('s')} % {UHASH_M})"


def uhash_min_spark(hashes: str, j: int) -> str:
    a, b = UHASH_PARAMS[j]
    return f"array_min(transform({hashes}, h -> ({a}L * h + {b}L) % {UHASH_P}))"


def uhash_min_duck(hashes: str, j: int) -> str:
    a, b = UHASH_PARAMS[j]
    return f"list_min(list_transform({hashes}, h -> ({a} * h + {b}) % {UHASH_P}))"


def jaccard_spark(a: str, b: str) -> str:
    """Exact Jaccard of two *distinct-element* arrays (int/int division in
    double — bit-identical across engines)."""
    return (
        f"cast(size(array_intersect({a}, {b})) as double) "
        f"/ cast(size(array_union({a}, {b})) as double)"
    )


def jaccard_duck(a: str, b: str) -> str:
    return (
        f"CAST(len(list_intersect({a}, {b})) AS DOUBLE) "
        f"/ CAST(len(list_distinct(list_concat({a}, {b}))) AS DOUBLE)"
    )
