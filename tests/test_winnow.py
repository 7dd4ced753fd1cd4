"""Winnowing fingerprint invariants (plans/winnow.py).

The sweep differentially checks Spark vs the DuckDB twin; these tests
pin the ALGORITHM against an independent pure-Python winnower (the
BPE-style third opinion) and the paper's guarantee: any substring
match of length >= W + K - 1 tokens shares a fingerprint, and exact
copies share their entire fingerprint set.
"""

from __future__ import annotations

import hashlib
import re

from star_schema_etl_airflow_spark.functions.text import UHASH_M
from star_schema_etl_airflow_spark.plans.winnow import (
    POS_BITS,
    SHARED_T,
    WINNOW_K,
    WINNOW_W,
    doc_winnow_overlap,
    winnow_fingerprints,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_winnow(text: str) -> set[tuple[int, int]]:
    """Independent reference: token k-grams -> md5 hashes -> per-window
    (ROWS CURRENT..W-1 FOLLOWING over full windows) min of
    g*2^POS_BITS+pos -> decoded (g, pos) set."""
    toks = re.split(r"\s+", text)
    if len(toks) < WINNOW_K:
        return set()
    grams = [
        int(hashlib.md5(
            " ".join(toks[i:i + WINNOW_K]).encode()
        ).hexdigest()[:15], 16) % UHASH_M
        for i in range(len(toks) - WINNOW_K + 1)
    ]
    n = len(grams)
    out = set()
    for p in range(0, n - WINNOW_W + 1):
        key = min(grams[p + j] * (1 << POS_BITS) + (p + j)
                  for j in range(WINNOW_W))
        out.add((key >> POS_BITS, key % (1 << POS_BITS)))
    return out


def test_matches_pure_python_reference(spark):
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "text").limit(25)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got: dict[int, set] = {d: set() for d in texts}
    for r in winnow_fingerprints(docs).collect():
        got[r["doc_id"]].add((r["g"], r["pos"]))
    for d, text in texts.items():
        assert got[d] == _py_winnow(text), f"doc {d}"


def test_paper_guarantee_shared_long_substring_shares_a_fingerprint(
    spark
):
    """Theorem 1 (Schleimer et al.): a shared token run of length
    W + K - 1 contains a full window of identical gram VALUES on both
    sides; the window minima may select different positions but at
    least one selected gram VALUE from the run is common.  Construct
    pairs embedding one long shared run inside distinct noise."""
    run = " ".join(f"shared{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    rows = []
    for j in range(6):
        left = " ".join(f"a{j}x{i}" for i in range(10))
        right = " ".join(f"b{j}y{i}" for i in range(10))
        rows.append((2 * j, f"{left} {run} {right}"))
        rows.append((2 * j + 1, f"{right} {run} {left}"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    fps = winnow_fingerprints(df).collect()
    by_doc: dict[int, set[int]] = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["g"])
    for j in range(6):
        shared = by_doc[2 * j] & by_doc[2 * j + 1]
        assert shared, f"pair {j} shares no fingerprint value"


def test_spans_are_disjoint_and_cover_every_overlap_pair(spark):
    """Span invariants (r11 verdict task 7): within a pair, spans are
    pairwise disjoint with gaps > SPAN_GAP between them (the islands
    merge is maximal — adjacent spans would have merged); every overlap
    pair has at least one span and vice versa; and each span's
    fingerprint count is positive with span_end >= span_start + K - 1."""
    from star_schema_etl_airflow_spark.plans.winnow import (
        doc_winnow_spans,
        SPAN_GAP,
    )

    spans = doc_winnow_spans(spark, SF_DIR).collect()
    assert spans
    by_pair: dict[tuple, list] = {}
    for r in spans:
        assert r["n_fps"] >= 1
        assert r["span_end"] >= r["span_start"] + WINNOW_K - 1
        by_pair.setdefault((r["doc_a"], r["doc_b"]), []).append(
            (r["span_start"], r["span_end"]))
    for pair, ivals in by_pair.items():
        ivals.sort()
        for (s1, e1), (s2, e2) in zip(ivals, ivals[1:]):
            assert s2 > e1, f"{pair}: overlapping spans {ivals}"
            # maximality: had the gap been <= SPAN_GAP (in gram-start
            # coordinates), the islands merge would have joined them
            assert s2 - (e1 - WINNOW_K + 1) > SPAN_GAP, (
                f"{pair}: unmerged adjacent spans {ivals}")
    overlap_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in doc_winnow_overlap(spark, SF_DIR).collect()
    }
    assert set(by_pair) == overlap_pairs


def test_incremental_probe_semantics(spark):
    """Probe pins (the same trio every incremental family pins):
    (1) light-mutated recrawls match their originals through the
    at-rest index; (2) reversed-new docs match nothing; (3) the probe
    result is a subset of what a full corpus∪batch overlap would find
    involving batch docs (the index is corpus-capped, so the probe can
    only see corpus-side fingerprints)."""
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        BATCH_FRESH_OFFSET,
        BATCH_MUTANT_OFFSET,
    )
    from star_schema_etl_airflow_spark.plans.winnow import (
        doc_winnow_incremental,
    )

    rows = doc_winnow_incremental(spark, SF_DIR).collect()
    assert rows, "probe found no matches at all"
    by_batch: dict[int, set[int]] = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], set()).add(r["corpus_id"])
    for bid, matches in by_batch.items():
        assert bid < BATCH_FRESH_OFFSET, (
            f"reversed-new doc {bid} matched {matches} — disjoint "
            "grams must not share fingerprints")
    # most mutants match their own source doc
    own = sum(
        1 for bid, m in by_batch.items()
        if bid - BATCH_MUTANT_OFFSET in m
    )
    assert own >= 0.8 * len(by_batch), (
        f"only {own}/{len(by_batch)} mutants matched their source")


def test_position_overflow_raises_instead_of_aliasing(spark):
    """A document with more than 2^POS_BITS grams must trip the guard
    (r11 ADVICE): silent aliasing of position bits into the gram hash
    would corrupt selection identically on both engines, invisible to
    the oracle sweep."""
    import pytest

    n_toks = (1 << POS_BITS) + WINNOW_K  # n_grams = 2^POS_BITS + 1
    text = " ".join(["t"] * n_toks)
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    with pytest.raises(Exception, match=r"exceeds 2\^20 grams"):
        winnow_fingerprints(df).collect()


def test_overlap_contains_every_exact_copy_pair(spark):
    """Exact copies (doc d and d + EXACT_DUP_OFFSET in the amplified
    corpus) have identical fingerprint VALUE sets, so every such pair
    with >= SHARED_T fingerprints must appear in the overlap join."""
    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        EXACT_DUP_OFFSET,
    )
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    out = {(r["doc_a"], r["doc_b"]): r["shared_fps"]
           for r in doc_winnow_overlap(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "text").collect()
    for r in docs:
        if r["doc_id"] % 10 != 0:
            continue
        values = {g for g, _ in _py_winnow(r["text"])}
        if len(values) < SHARED_T:
            continue
        pair = (r["doc_id"], r["doc_id"] + EXACT_DUP_OFFSET)
        assert pair in out, pair
        # DF-capped grams can only LOWER the shared count
        assert out[pair] <= len(values)
