#!/usr/bin/env python
"""Prune-trajectory curve for the Kudo'18 unigram-LM trainer
(r15 verdict task 2 'Done' artifact): at each pruning round, the
multi-char vocabulary size, the corpus token census, the exact corpus
negative log-likelihood (micro fixed point — INT64, both engines'
arithmetic), and chars/token.

The claim the figure supports: likelihood-loss pruning removes the
pieces whose removal costs the LEAST corpus likelihood, so NLL decays
slowly (and chars/token degrades gracefully) while the vocabulary
shrinks 2x — the property that makes pruned vocabularies usable.  A
frequency-only prune would show the same vocab trajectory but a worse
NLL curve.

Quality curve, not a timing curve — no quiet-host protocol needed.

Usage: python tools/prune_curve.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from star_schema_etl_airflow_spark.operators.unigram import (  # noqa: E402
    prune_round,
    prune_schedule,
    segment_words,
    train_unigram,
)
from star_schema_etl_airflow_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def metrics(vocab, words):
    seg = segment_words(words, vocab)
    toks = seg.select(F.explode("tokens").alias("piece"), "freq")
    row = (
        toks.join(F.broadcast(vocab.select("piece", "lp_micro")), "piece")
        .agg(
            F.sum("freq").alias("n_tokens"),
            F.sum(F.col("freq") * (-F.col("lp_micro"))).alias("nll_micro"),
        )
        .first()
    )
    chars = words.agg(
        F.sum(F.expr("freq * length(word)")).alias("c")
    ).first()["c"]
    n_multi = vocab.filter(F.length("piece") >= 2).count()
    return n_multi, row["n_tokens"], row["nll_micro"], chars


def main() -> None:
    spark = get_spark(app_name="prune_curve")
    spark.sparkContext.setLogLevel("ERROR")
    vocab, words = train_unigram(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    )
    rows = []
    m, nt, nll, chars = metrics(vocab, words)
    rows.append(("post-EM (unpruned)", m, nt, nll, chars / nt))
    for k, keep in enumerate(prune_schedule(), start=1):
        vocab = prune_round(vocab, words, keep).localCheckpoint()
        m, nt, nll, chars = metrics(vocab, words)
        rows.append((f"prune round {k}", m, nt, nll, chars / nt))
    base_nll = rows[0][3]
    print(f"### Unigram-LM prune trajectory ({SF_DIR}, Kudo'18 §3.2)")
    print()
    print("| stage | multi pieces | corpus tokens | corpus NLL (micro) "
          "| NLL vs unpruned | chars/token |")
    print("|---|---|---|---|---|---|")
    for name, m, nt, nll, cpt in rows:
        print(f"| {name} | {m} | {nt} | {nll} "
              f"| {(nll - base_nll) / base_nll:+.3%} | {cpt:.4f} |")


if __name__ == "__main__":
    main()
