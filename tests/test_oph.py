"""Densified one-permutation MinHash (Shrivastava ICML'14) vs a
pure-Python reference: bin minima, rotation densification with the
t·C offset, and recall parity against the injected dedup truth."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    SHINGLE_N,
    UHASH_M,
    UHASH_P,
)
from star_schema_etl_airflow_spark.plans.oph import (
    K_BINS,
    OPH_A,
    OPH_B,
    OPH_C,
    oph_signature_of,
)

SF_DIR = "/root/testdata/sf0.001"


def _md5_long(s: str) -> int:
    # functions/text.md5_long_*: first 15 hex chars as a positive int
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_signature(text: str) -> list[int | None]:
    toks = [t for t in text.split() if t]
    sh = [" ".join(toks[i:i + SHINGLE_N])
          for i in range(len(toks) - SHINGLE_N + 1)]
    hs = list(dict.fromkeys(_md5_long(s) % UHASH_M for s in sh))
    pis = [(OPH_A * h + OPH_B) % UHASH_P for h in hs]
    bins: list[int | None] = [None] * K_BINS
    for p in pis:
        j = p % K_BINS
        v = p // K_BINS
        if bins[j] is None or v < bins[j]:
            bins[j] = v
    out = []
    for j in range(K_BINS):
        val = None
        for t in range(K_BINS):
            jj = (j + t) % K_BINS
            if bins[jj] is not None:
                val = bins[jj] + t * OPH_C
                break
        out.append(val)
    return out


def test_oph_signature_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = {
        r.doc_id: [r[f"mh{j}"] for j in range(K_BINS)]
        for r in oph_signature_of(docs).collect()
    }
    assert set(got) == set(texts)
    for did, text in texts.items():
        assert got[did] == _ref_signature(text), did


def test_densification_fills_empty_bins_with_offsets(spark):
    """A document with a single shingle fills exactly one bin; every
    other component must be that bin's value plus t·C for its rotation
    distance t — and no component may be NULL."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )  # 3 tokens, SHINGLE_N=3 → exactly one shingle
    row = oph_signature_of(docs).collect()[0]
    vals = [row[f"mh{j}"] for j in range(K_BINS)]
    assert all(v is not None for v in vals)
    base_j = min(range(K_BINS), key=lambda j: vals[j])
    base = vals[base_j]
    for j in range(K_BINS):
        t = (base_j - j) % K_BINS
        assert vals[j] == base + t * OPH_C, (j, t)


def test_oph_recall_parity_with_krehash(spark):
    """Both estimators must see every exact duplicate (J=1 collides in
    every band under any permutation) and a nonzero share of the near
    duplicates."""
    from star_schema_etl_airflow_spark.plans.oph import (
        dedup_minhash_oph_eval,
    )

    r = dedup_minhash_oph_eval(spark, SF_DIR).collect()[0]
    assert r.recall_exact == 1.0
    assert r.n_relevant_near > 0 and r.n_tp_near >= 0
    assert r.cand_precision > 0.5


def test_arrow_signature_equals_hof_signature(spark):
    """The vectorized (numpy/Arrow) signature must be bit-identical to
    the interpreted HOF form — same integer arithmetic, two
    independent implementations, one oracle."""
    from star_schema_etl_airflow_spark.plans.llm_dedup import build_corpus
    from star_schema_etl_airflow_spark.plans.oph import (
        oph_signature_arrow,
        oph_signature_of,
    )

    corpus = build_corpus(spark, SF_DIR)
    cols = [f"mh{j}" for j in range(K_BINS)]
    a = {r.doc_id: tuple(r[c] for c in cols)
         for r in oph_signature_of(corpus).collect()}
    b = {r.doc_id: tuple(r[c] for c in cols)
         for r in oph_signature_arrow(corpus).collect()}
    assert a == b


def test_arrow_signature_matches_hof_on_degenerate_docs(spark):
    """Short docs collapse to one whole-doc shingle; an empty doc has
    an empty shingle set — the Arrow kernel must agree with the HOF
    form on both (the all-empty-bins densification path)."""
    from star_schema_etl_airflow_spark.plans.oph import (
        oph_signature_arrow,
        oph_signature_of,
    )

    docs = spark.createDataFrame(
        [(1, "only two"), (2, "three word doc here"), (3, "")],
        "doc_id long, text string",
    )
    cols = [f"mh{j}" for j in range(K_BINS)]
    a = {r.doc_id: tuple(r[c] for c in cols)
         for r in oph_signature_of(docs).collect()}
    b = {r.doc_id: tuple(r[c] for c in cols)
         for r in oph_signature_arrow(docs).collect()}
    assert a == b
    assert all(v is not None for v in a[2])
