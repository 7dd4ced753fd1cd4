"""k-means‖ (Bahmani VLDB'12) deterministic init vs an independent
pure-Python reference: exact candidate-set equality per oversampling
round, exact weighted-re-cluster centers, and the final assignment —
plus the ablation invariant that the variant eval actually reads it."""

from __future__ import annotations

import math

import pandas as pd

from star_schema_etl_airflow_spark.operators.kmeans import (
    KMPAR_HASH_A,
    KMPAR_HASH_B,
    KMPAR_HASH_M,
    scalable_init,
)
from star_schema_etl_airflow_spark.plans.kmeans_scalable import (
    EMB_DIM,
    KMPAR_L,
    KMPAR_RELLOYD,
    KMPAR_ROUNDS,
    kmeans_scalable_init,
)
from star_schema_etl_airflow_spark.plans.clustering_queries import K

SF_DIR = "/root/testdata/sf0.001"


# --- pure-Python reference (plain loops: left-fold float accumulation
# matches both engines' folds; integer d2 / phi sums are exact) -------------

def _ref_load():
    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    out = []
    for _, r in df.iterrows():
        sv = [int(math.floor(float(x) * 1e6 + 0.5)) for x in r.embedding]
        out.append((int(r.vec_id), sv))
    out.sort()
    return out


def _d_int(a, b):
    s = 0
    for x, y in zip(a, b):
        s += (x - y) * (x - y)
    return s


def _d_mix(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += (float(x) - y) * (float(x) - y)
    return s


def _ref_init(pts, k, l, rounds, relloyd):
    cand = {pts[0][0]: pts[0][1]}              # lowest vec_id
    for r in range(1, rounds + 1):
        d2 = {
            vid: min(_d_int(sv, c) for c in cand.values())
            for vid, sv in pts
        }
        phi = float(sum(d2.values()))
        new = {}
        for vid, sv in pts:
            if d2[vid] <= 0:
                continue
            h = ((vid + 1) * KMPAR_HASH_A + r * KMPAR_HASH_B) % KMPAR_HASH_M
            if float(h) < (float(l) * float(d2[vid]) / phi) * float(
                KMPAR_HASH_M
            ):
                new[vid] = sv
        cand.update(new)
    # weights: nearest candidate, ties lowest cid
    w = {cid: 0 for cid in cand}
    for vid, sv in pts:
        best = min((_d_int(sv, c), cid) for cid, c in cand.items())
        w[best[1]] += 1
    # weighted Lloyd over candidates, init = k lowest cids
    centers = {
        cid: [float(x) for x in cand[cid]] for cid in sorted(cand)[:k]
    }
    for _j in range(relloyd):
        groups: dict = {}
        for cid in sorted(cand):
            best = min(
                (_d_mix(cand[cid], c), cl) for cl, c in centers.items()
            )
            groups.setdefault(best[1], []).append(cid)
        centers = {}
        for cl, members in groups.items():
            den = sum(w[cid] for cid in members)
            centers[cl] = [
                float(sum(cand[cid][d] * w[cid] for cid in members)) / den
                for d in range(EMB_DIM)
            ]
    return cand, w, centers


def test_scalable_init_matches_reference(spark):
    pts = _ref_load()
    cand, w, centers = _ref_init(
        pts, K, KMPAR_L, KMPAR_ROUNDS, KMPAR_RELLOYD
    )
    # the oversampling really sampled something beyond the seed
    assert len(cand) > 1
    import pyspark.sql.functions as F
    from star_schema_etl_airflow_spark.plans.pq import _SV_S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.expr(_SV_S).alias("sv")
    )
    got = {
        r.cluster: list(r.c)
        for r in scalable_init(
            emb, K, KMPAR_L, KMPAR_ROUNDS, dim=EMB_DIM,
            relloyd=KMPAR_RELLOYD,
        ).collect()
    }
    assert got == centers


def test_assignment_query_matches_reference(spark):
    pts = _ref_load()
    _cand, _w, centers = _ref_init(
        pts, K, KMPAR_L, KMPAR_ROUNDS, KMPAR_RELLOYD
    )
    want = {}
    for vid, sv in pts:
        best = min((_d_mix(sv, c), cl) for cl, c in centers.items())
        want[vid] = best[1]
    got = {
        r.vec_id: r.cluster
        for r in kmeans_scalable_init(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(set(got.values())) <= K


def test_variant_eval_reports_the_scalable_row(spark):
    from star_schema_etl_airflow_spark.plans.ivfpq_opq import (
        ivfpq_variant_eval,
    )

    rows = {
        r.variant: r for r in ivfpq_variant_eval(spark, SF_DIR).collect()
    }
    assert set(rows) == {"band", "trained", "trained_scal", "opq"}
    assert rows["trained_scal"].n_scored > 0
    assert 0.0 <= rows["trained_scal"].recall_codes <= 1.0
