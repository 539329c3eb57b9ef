#!/usr/bin/env python
"""N-gram LM quality-scoring throughput (functions/ngram_lm.py — the
CCNet stage): train Stupid-Backoff trigram counts on a 10%
deterministic hash-sample of the corpus, then score EVERY doc in one
zero-shuffle mapInArrow pass, at two parallelism levels. Reports
per-stage time, score docs/s, and the N→4N scaling efficiency.

Reuses bench_text_pipeline's cached corpus (word-salad docs with
planted hazards; the tiny vocabulary makes the model small, which is
representative — a pruned CCNet model is MBs against a TB corpus, and
this bench measures the corpus-side scan, not model size).

Env: SPARK_GRAFT_TEXT_DOCS (default 200000), SPARK_GRAFT_TEXT_LEVELS
(default "4,16"). One JSON line; appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))

from bench_text_pipeline import ensure_corpus


def run_level(corpus: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from delver_spark.functions import ngram_lm
    from delver_spark.operators.textstats import deterministic_sample
    from delver_spark.session import get_spark

    spark = get_spark(f"lmbench_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    docs = spark.read.parquet(corpus).localCheckpoint(eager=True)
    n = docs.count()

    t0 = time.perf_counter()
    counts = ngram_lm.train_ngram_lm(
        deterministic_sample(docs, 100)).localCheckpoint(eager=True)
    n_grams = counts.count()
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    scored = ngram_lm.lm_score(docs, counts, min_count=2)
    agg = scored.agg(F.count("*").alias("n"),
                     F.sum("score_q").alias("sq"),
                     F.sum("oov").alias("oov")).collect()[0]
    t_score = time.perf_counter() - t0
    assert agg["n"] == n

    spark.stop()
    total = t_train + t_score
    return {"cpus": cpus, "n": n, "grams": int(n_grams),
            "oov": int(agg["oov"]), "score_sum": int(agg["sq"]),
            "train_s": round(t_train, 2), "score_s": round(t_score, 2),
            "score_docs_per_s": round(n / t_score, 1)}


def main():
    n = int(os.environ.get("SPARK_GRAFT_TEXT_DOCS", 200000))
    levels = [int(x) for x in
              os.environ.get("SPARK_GRAFT_TEXT_LEVELS", "4,16").split(",")]
    corpus = ensure_corpus(n)

    res = [run_level(corpus, c) for c in levels]
    lo, hi = res[0], res[-1]
    # cross-core-count determinism: identical model => identical scores
    assert lo["score_sum"] == hi["score_sum"] and lo["oov"] == hi["oov"]
    ratio = hi["cpus"] / lo["cpus"]
    eff = (hi["score_docs_per_s"] / lo["score_docs_per_s"]) / ratio
    out = {"metric": "lm_score", "docs": n, "levels": res,
           "scaling_eff": round(eff, 3)}
    print(json.dumps(out))
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| lm quality scoring ({n} docs, trigram stupid-backoff) | "
            f"local[{lo['cpus']}] score {lo['score_docs_per_s']} docs/s "
            f"(train {lo['train_s']}s) | local[{hi['cpus']}] score "
            f"{hi['score_docs_per_s']} docs/s (train {hi['train_s']}s) | "
            f"N→{int(ratio)}N efficiency {out['scaling_eff']} |\n")


if __name__ == "__main__":
    main()