#!/usr/bin/env python
"""Empirical scaling curves for representative operators.

Builds ×1/×2/×4/×8 TIMING-ONLY copies of the sf0.1 fixtures in /tmp
(key-shifted fact rows; documents re-tokenized into DISJOINT per-copy
vocabularies so no artificial cross-copy near-duplicates inflate the
dedup candidate sets — replicating text verbatim would make every
banded self-join quadratic by construction, which says nothing about
real corpora), runs each headline-shape operator at every scale, and
fits the log-log slope: an exponent near 1.0 is the "survives a
100× scale-up" evidence SCALE.md argues for analytically.

These scaled tables are benchmark inputs only — correctness is always
judged against the driver-provided fixtures (TESTDATA.md), never
synthesized data.

Usage: python tools/scale_curve.py [max_factor] > SCALE_CURVE.md
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/scale_curve"
STATIC_TABLES = ["region", "nation", "customer", "supplier", "part",
                 "events", "embeddings"]

QUERIES = [
    # name -> why it represents a scale class
    ("sales_summary", "join+agg star query (2 shuffles, broadcast dims)"),
    ("q7_volume_shipping", "multi-dim broadcast join pipeline"),
    ("dedup_exact", "corpus-wide hash-groupBy"),
    ("dedup_minhash_lsh", "banded self-join + verify"),
    ("dedup_substring_spans", "tokens-sized gram shuffle ×2"),
    ("ngram_lm_score", "bigram model train + score join (persisted bg)"),
    ("bm25_topk", "broadcast-index retrieval + top-k"),
    # round-7 additions (r6 verdict task 5): the expensive families that
    # had no measured ×1-×8 row
    ("multimodal_decoded", "pure-Python codec decode via mapInPandas"),
    ("embed_jl_rerank", "JL shortlist + exact re-rank equi-join"),
    ("curation_pipeline_v5", "full multi-stage curation composition"),
    ("video_frames", "MJPEG/AVI encode+decode kernel (ffmpeg swap-in)"),
    # round-9 additions (r8 verdict task 4): the two operators whose
    # complexity shape changed in round 8
    ("dedup_prefix_join", "PPJoin prefix+length+positional pruned join"),
    ("semdedup", "k-means codebook + in-cluster cosine prune"),
]


def build_scaled(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = f"{WORK}/x{factor}"
    if os.path.isdir(out):
        return out
    os.makedirs(out)
    for t in STATIC_TABLES:
        os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for c in range(factor):
        if c == 0:
            parts.append(docs)
        else:
            parts.append(
                docs.select(
                    (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
                    # disjoint vocabulary per copy: prefix every token
                    F.regexp_replace("text", r"(\S+)", f"c{c}$1")
                    .alias("text"),
                    *[col for col in docs.columns
                      if col not in ("doc_id", "text")],
                )
            )
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.write.parquet(f"{out}/documents.parquet")

    for t, key_cols in (("orders", ["o_orderkey"]),
                        ("lineitem", ["l_orderkey"])):
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        ps = []
        for c in range(factor):
            if c == 0:
                ps.append(df)
            else:
                shifted = df
                for kc in key_cols:
                    shifted = shifted.withColumn(
                        kc, F.col(kc) + c * 1_000_000_000
                    )
                ps.append(shifted)
        u = ps[0]
        for p in ps[1:]:
            u = u.unionByName(p)
        u.write.parquet(f"{out}/{t}.parquet")
    return out


def _stream_fold_time(spark, sf_dir: str, factor: int,
                      trials: int) -> float:
    """The streaming batch-twin row (r6 verdict task 5): stage the
    scaled documents as 4 landing files and time the full
    run_substring_stream fold (4 micro-batches probing/updating the
    gram index).  Fresh corpus/index/checkpoint dirs per trial —
    availableNow + an existing checkpoint would otherwise no-op."""
    import glob as _glob

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.streaming.substring_stream import (
        run_substring_stream,
    )

    landing = f"{WORK}/stream_x{factor}/landing"
    if not os.path.isdir(landing):
        os.makedirs(landing)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text")
        for b in range(4):
            stage = f"{WORK}/stream_x{factor}/stage_{b}"
            docs.filter(F.col("doc_id") % 4 == b).coalesce(1) \
                .write.mode("overwrite").parquet(stage)
            part = _glob.glob(f"{stage}/part-*.parquet")[0]
            os.rename(part, f"{landing}/batch_{b}.parquet")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    best = None
    for t in range(trials):
        run_dir = f"{WORK}/stream_x{factor}/run_{t}"
        shutil.rmtree(run_dir, ignore_errors=True)
        t0 = time.perf_counter()
        run_substring_stream(
            spark, landing, f"{run_dir}/corpus", f"{run_dir}/grams",
            schema,
        ).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def deep_main() -> None:
    """--deep: ×4→×32 cells for the two steepest operators (r9 verdict
    task 4) — the ×1/×2 cells are overhead-confounded (fixed scheduling
    latency dominates sub-3s cells), so the committed exponent for
    these is computed over the work-dominated ×4→×32 regime.  Docs-only
    scaled corpora (both queries read documents + the static
    embeddings); one trial at ×16/×32 where work dwarfs jitter."""
    import glob as _glob

    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark
    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        prefix_join_candidates,
    )

    factors = [4, 8, 16, 32]
    spark = get_spark("scale-curve-deep")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()

    def pyloop() -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(10_000_000):
            x += i * i
        return round(time.perf_counter() - t0, 3)

    cal = [pyloop()]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    def build_docs_only(factor: int) -> str:
        from pyspark.sql import functions as F

        out = f"{WORK}/deep_x{factor}"
        if os.path.isdir(out):
            return out
        os.makedirs(out)
        for t in STATIC_TABLES + ["orders", "lineitem"]:
            os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
        docs = spark.read.parquet(f"{BASE}/documents.parquet")
        parts = []
        for c in range(factor):
            if c == 0:
                parts.append(docs)
            else:
                parts.append(docs.select(
                    (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
                    F.regexp_replace("text", r"(\S+)", f"c{c}$1")
                    .alias("text"),
                    *[col for col in docs.columns
                      if col not in ("doc_id", "text")],
                ))
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d.write.parquet(f"{out}/documents.parquet")
        return out

    deep_queries = ["dedup_prefix_join", "curation_pipeline_v5"]
    dirs = {f: build_docs_only(f) for f in factors}
    for name in deep_queries:  # JIT warmup at the smallest deep factor
        materialize(qmap[name](spark, dirs[4]))

    times: dict[str, dict[int, float]] = {}
    cand: dict[int, int] = {}
    docs_n: dict[int, int] = {}
    for f in factors:
        trials = 2 if f <= 8 else 1
        for name in deep_queries:
            spark.catalog.clearCache()
            best = None
            for _t in range(trials):
                t0 = time.perf_counter()
                materialize(qmap[name](spark, dirs[f]))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.setdefault(name, {})[f] = round(best, 3)
            print(f"  deep x{f} {name}: {best:.3f}s", file=sys.stderr)
        spark.catalog.clearCache()
        toks, cands = prefix_join_candidates(spark, dirs[f])
        docs_n[f] = toks.count()
        cand[f] = cands.count()
        print(f"  deep x{f} ppjoin candidates: {cand[f]}", file=sys.stderr)
        cal.append(pyloop())

    lo, hi = factors[0], factors[-1]
    print("## Deep curve ×4→×32 (work-dominated regime; r9 verdict task 4)")
    print()
    print("Docs-only scaled corpora (disjoint per-copy vocabularies);")
    print("exponents fit over ×4→×32 where fixed per-query stage latency")
    print("no longer confounds the slope (the full-table ×1→×8 rows for")
    print("these two operators read low for exactly that reason).")
    print()
    print(f"Host pyloop stamps around the cells: {cal} "
          "(quiet ≈ 0.46-0.55s on this box — read contended cells "
          "against these).")
    print()
    print("| operator | " + " | ".join(f"×{f}" for f in factors)
          + " | exponent ×4→×32 |")
    print("|---|" + "---|" * (len(factors) + 1))
    for name in deep_queries:
        row = times[name]
        expo = math.log(row[hi] / row[lo]) / math.log(hi / lo)
        cells = " | ".join(f"{row[f]:.2f}s" for f in factors)
        print(f"| {name} | {cells} | {expo:.2f} |")
    print()
    print("| factor | docs | candidate pairs | cands/doc |")
    print("|---|---|---|---|")
    for f in factors:
        print(f"| ×{f} | {docs_n[f]} | {cand[f]} "
              f"| {cand[f] / docs_n[f]:.0f} |")
    cexpo = math.log(cand[hi] / cand[lo]) / math.log(hi / lo)
    print()
    print(f"PPJoin candidate-count exponent ×4→×{hi}: {cexpo:.2f} "
          "(healthy pruned shape ~1.0; the per-doc candidate count "
          "staying flat across an 8× corpus growth is the structural "
          "guard a pruning regression would trip).")


def main() -> None:
    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    if "--deep" in sys.argv:
        deep_main()
        return

    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    factors = [f for f in (1, 2, 4, 8) if f <= max_factor]
    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)
    dirs = {f: build_scaled(spark, f) for f in factors}

    qmap = registry.queries()

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # JIT warmup at x1
    for name, _ in QUERIES:
        materialize(qmap[name](spark, dirs[1]))

    times: dict[str, dict[int, float]] = {}
    for f in factors:
        # best-of-3 at the small factors, best-of-2 at the large ones:
        # the ×1/×2 cells are short enough that ONE unlucky AQE re-plan
        # or host stall inverts the curve (r6 verdict task 6 observed
        # dedup_substring_spans ×2 > ×4); a third trial at small f costs
        # seconds and makes the committed curve monotone
        trials = 3 if f <= 2 else 2
        for name, _ in QUERIES:
            # Each query's trial set starts from a clean cache: the
            # operators' persist_once() entries otherwise accumulate
            # across queries and factors (14 queries × 4 corpora), so a
            # cell's time depended on RUN ORDER — whichever dedup query
            # ran first paid the shared corpus build, and by ×8 the
            # storage pool was full of earlier factors' leftovers
            # (dedup_prefix_join: 27s isolated vs 68s in the crowded
            # session).  Clearing per trial SET keeps bench semantics —
            # trial 1 rebuilds the query's own caches, best-of-N rides
            # them warm — while making every cell order-independent.
            spark.catalog.clearCache()
            best = None
            for _t in range(trials):
                t0 = time.perf_counter()
                materialize(qmap[name](spark, dirs[f]))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.setdefault(name, {})[f] = round(best, 3)
            print(f"  x{f} {name}: {times[name][f]:.3f}s", file=sys.stderr)
        spark.catalog.clearCache()
        dt = _stream_fold_time(spark, dirs[f], f, trials)
        times.setdefault("substring_stream_fold", {})[f] = dt
        print(f"  x{f} substring_stream_fold: {dt:.3f}s", file=sys.stderr)

    print("# SCALE_CURVE — measured operator scaling (sf0.1 × factor)")
    print()
    print("Generated by `python tools/scale_curve.py` on local[32].")
    print("Timing-only scaled inputs (disjoint per-copy vocabularies /")
    print("shifted keys — see the tool docstring); exponent = log-log")
    print("slope of best-of-2 times between ×1 and the largest factor.")
    print("~1.0 = linear; shuffle-bound operators on a fixed-core box")
    print("drift slightly above 1 once spills start.")
    print()
    hdr = "| operator | " + " | ".join(f"×{f}" for f in factors) \
        + " | exponent | scale class |"
    print(hdr)
    print("|---|" + "---|" * (len(factors) + 2))
    all_rows = QUERIES + [
        ("substring_stream_fold",
         "streaming batch-twin: 4-batch incremental substring dedup"),
    ]
    for name, why in all_rows:
        row = times[name]
        expo = (math.log(row[factors[-1]] / row[1])
                / math.log(factors[-1])) if factors[-1] > 1 else 0.0
        cells = " | ".join(f"{row[f]:.2f}s" for f in factors)
        print(f"| {name} | {cells} | {expo:.2f} | {why} |")

    # PPJoin candidate-ROW curve (r8 verdict task 4): the pruning power
    # is the operator's scale story — wall-time alone would hide a
    # pruning regression behind shuffle noise.  Scaled copies use
    # disjoint vocabularies, so candidates can only pair within a copy:
    # a healthy curve is ~linear in the factor (k copies × the per-copy
    # candidate set), and anything superlinear means the pruning broke.
    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        prefix_join_candidates,
    )

    print()
    print("## PPJoin candidate-row curve (`dedup_prefix_join`)")
    print()
    print("| factor | docs | candidate pairs | cands/doc |")
    print("|---|---|---|---|")
    cand = {}
    for f in factors:
        toks, cands = prefix_join_candidates(spark, dirs[f])
        docs = toks.count()
        cand[f] = cands.count()
        print(f"| ×{f} | {docs} | {cand[f]} | {cand[f] / docs:.0f} |")
        print(f"  x{f} ppjoin_candidates: {cand[f]}", file=sys.stderr)
    cexpo = (math.log(cand[factors[-1]] / cand[1])
             / math.log(factors[-1])) if factors[-1] > 1 else 0.0
    print()
    print(f"Candidate-count exponent ×1→×{factors[-1]}: {cexpo:.2f} "
          "(disjoint per-copy vocabularies ⇒ ~1.0 is the healthy "
          "pruned shape; ~2.0 would mean the prefix/length/positional "
          "filters stopped cutting the cross-pair space).")


if __name__ == "__main__":
    main()
