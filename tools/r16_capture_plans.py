#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query into plans/r16/.

Usage: python tools/r16_capture_plans.py <suffix> [query ...]
  suffix: "before" | "after"
  with no query args, captures the full bench set (headline + extras).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r16")

BENCH_EXTRAS = [
    "image_dedup_dhash", "audio_dedup_fingerprint",
    "dedup_incremental_minhash", "doc_winnow_overlap", "image_knn_dhash",
    "curation_multimodal_clusters", "retrieval_rrf", "kmv_source_overlap",
    "zorder_skip_stats", "embed_ivfpq_rerank", "hard_negatives",
    "curriculum_order", "embed_ivfpq_opq", "dedup_clusters_bigstar",
    "dedup_minhash_oph",
]


def main() -> None:
    suffix = sys.argv[1]
    os.makedirs(OUT, exist_ok=True)

    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark(app_name=f"r16-plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[2:]
    if not names:
        names = [s.name for s in registry.specs() if s.headline] + BENCH_EXTRAS

    qmap = registry.queries()
    for name in names:
        df = qmap[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name}_{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()
