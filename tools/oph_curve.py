#!/usr/bin/env python
"""OPH vs K-rehash signature cost, by component and by K (r15 verdict
task 6's measurement).

Three measurements over the sf0.1 corpus (quiet host required):

1. **End-to-end signature build** (md5 shingle pass + hash-min), the
   two registered queries' front — shows the shared md5 pass dominates
   at fixture scale, so end-to-end deltas are small by construction.
2. **Hash-min component only** (the part OPH changes), Spark HOF
   forms, K = 16/32/64: K-rehash runs K heavy universal-hash passes;
   the OPH form runs 1 permutation pass + K cheap bin-min passes.
   In Spark's interpreted higher-order-function lambdas the per-pass
   overhead (boxing, interpreted eval) equalizes the two — measured
   here rather than assumed.
3. **Vectorized twin** (numpy over the same pre-hashed shingle sets,
   the repo's Arrow lane): K-rehash is K vectorized passes, OPH is ONE
   pass (`np.minimum.at` scatter) — the paper's K× win appears in the
   engine-appropriate form, and this is the form a 100 TB deployment
   would use (mapInPandas, like the JL projection).

Usage: python tools/oph_curve.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from star_schema_etl_airflow_spark.functions.text import (  # noqa: E402
    UHASH_P,
    _uhash_params,
    shingle_hashes_spark,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import (  # noqa: E402
    _SH_S,
    build_corpus,
    signature_of,
)
from star_schema_etl_airflow_spark.plans.oph import (  # noqa: E402
    OPH_A,
    OPH_B,
    oph_signature_of,
)
from star_schema_etl_airflow_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KS = (16, 32, 64)


def best_of(f, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    spark = get_spark(app_name="oph_curve")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(spark, SF_DIR).localCheckpoint()
    sets = corpus.select(
        "doc_id",
        F.expr(f"array_distinct({shingle_hashes_spark(_SH_S)})")
        .alias("hashes"),
    ).localCheckpoint()          # pre-hashed: isolates the hash-min part

    print(f"### OPH vs K-rehash signature cost ({SF_DIR})")
    print()
    e2e_k = best_of(lambda: signature_of(corpus).agg(
        F.bit_xor(F.xxhash64("mh0", "mh15"))).collect())
    e2e_o = best_of(lambda: oph_signature_of(corpus).agg(
        F.bit_xor(F.xxhash64("mh0", "mh15"))).collect())
    md5 = best_of(lambda: sets.agg(
        F.bit_xor(F.xxhash64(F.expr("hashes[0]")))).collect())
    print(f"end-to-end signature (K=16): krehash {e2e_k:.3f}s, "
          f"oph {e2e_o:.3f}s; shared md5 shingle pass alone {md5:.3f}s")
    print()
    print("| K | krehash HOF (s) | oph HOF (s) | krehash numpy (s) "
          "| oph numpy (s) |")
    print("|---|---|---|---|---|")

    pdf = sets.toPandas()
    arrs = [np.asarray(h, dtype=np.int64) for h in pdf["hashes"]]
    flat = np.concatenate([a for a in arrs if len(a)]) if arrs else \
        np.empty(0, np.int64)
    doc_idx = np.repeat(np.arange(len(arrs)), [len(a) for a in arrs])

    for k in KS:
        params = _uhash_params(k)
        mh = [
            f"array_min(transform(hashes, h -> ({a}L * h + {b}L) "
            f"% {UHASH_P})) AS mh{j}"
            for j, (a, b) in enumerate(params)
        ]
        t_kre = best_of(lambda: sets.selectExpr("doc_id", *mh).agg(
            F.bit_xor(F.xxhash64("mh0"))).collect())
        pi = (f"transform(hashes, h -> ({OPH_A}L * h + {OPH_B}L) "
              f"% {UHASH_P})")
        bins = [
            f"array_min(transform(__pi, p -> if(p % {k} = {j}, "
            f"p div {k}, cast(null as bigint)))) AS b{j}"
            for j in range(k)
        ]
        t_oph = best_of(
            lambda: sets.selectExpr("doc_id", f"{pi} AS __pi")
            .selectExpr("doc_id", *bins)
            .agg(F.bit_xor(F.xxhash64("b0"))).collect()
        )

        def np_krehash():
            out = np.empty((len(arrs), k), dtype=np.int64)
            for j, (a, b) in enumerate(params):
                v = (a * flat + b) % UHASH_P
                m = np.full(len(arrs), np.iinfo(np.int64).max)
                np.minimum.at(m, doc_idx, v)
                out[:, j] = m
            return out

        def np_oph():
            p = (OPH_A * flat + OPH_B) % UHASH_P
            key = doc_idx * k + (p % k)
            m = np.full(len(arrs) * k, np.iinfo(np.int64).max)
            np.minimum.at(m, key, p // k)
            return m.reshape(len(arrs), k)

        t_nk = best_of(np_krehash)
        t_no = best_of(np_oph)
        print(f"| {k} | {t_kre:.3f} | {t_oph:.3f} "
              f"| {t_nk:.4f} | {t_no:.4f} |")


if __name__ == "__main__":
    main()
