#!/usr/bin/env python
"""Corpus-hygiene operator bench: repetition_stats, pii_scrub, and
ngram_decontaminate throughput on a synthetic word-salad corpus
(deterministic JVM-side text synthesis — no Python in the data path,
text ~40 words/doc from a 64-word vocab, so gram collisions and
repetition flags are exercised for real). Prints one JSON line and
appends a row to BENCH/BASELINE.md. Run at two SPARK_GRAFT_CPUS levels
for a per-op scaling read (the ops are single-scan projections /
broadcast joins, so the expectation is near-linear).

Env: SPARK_GRAFT_HYGIENE_DOCS (default 2000000), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VOCAB = [f"w{i:02d}" for i in range(60)] + [
    "alpha", "beta", "gamma", "a@b.test"]


def main():
    from pyspark.sql import functions as F

    from delver_spark.operators import textstats as T
    from delver_spark.session import get_spark

    n_docs = int(os.environ.get("SPARK_GRAFT_HYGIENE_DOCS", 2_000_000))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("delver_bench_hygiene", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    n_words = 40
    # 10% of docs draw from a 4-word vocab so the repetition flags fire
    # for real (top word ~10/40 > 20%, dup words > 70%)
    vsize = F.when(F.col("id") % 10 == 0, F.lit(4)).otherwise(F.lit(64))
    text = F.array_join(
        F.transform(F.sequence(F.lit(1), F.lit(n_words)),
                    lambda i: F.element_at(
                        vocab,
                        F.pmod(F.hash(F.col("id") * 97 + i), vsize) + 1)),
        " ")
    docs = (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"), text.alias("text"))
            .repartition(cpus * 4).localCheckpoint(eager=True))

    timings, extras = {}, {}
    t0 = time.perf_counter()
    extras["flagged"] = (T.repetition_stats(docs)
                         .filter(~F.col("keep")).count())
    timings["repetition_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    extras["pii_docs"] = T.pii_scrub(docs).filter("has_pii").count()
    timings["pii_sec"] = round(time.perf_counter() - t0, 2)

    bench = docs.filter(F.col("doc_id") % 4096 == 0)
    t0 = time.perf_counter()
    extras["contaminated"] = (T.ngram_decontaminate(docs, bench, n=5)
                              .filter("contaminated").count())
    timings["decontaminate_sec"] = round(time.perf_counter() - t0, 2)

    from delver_spark.operators.dedup import duplicate_spans
    t0 = time.perf_counter()
    extras["span_rows"] = duplicate_spans(docs, window=8).count()
    timings["spans_sec"] = round(time.perf_counter() - t0, 2)

    # the bloom decontamination paths, timed OUTSIDE the headline
    # aggregate so the r4/r5 docs_per_sec series stays comparable
    bloom = {}
    t0 = time.perf_counter()
    extras["contaminated_bloom"] = (
        T.ngram_decontaminate_bloom(docs, bench, n=5)
        .filter("contaminated").count())
    bloom["decontaminate_bloom_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    extras["screened_bloom"] = (
        T.ngram_decontaminate_bloom(docs, bench, n=5, verify=False)
        .filter("contaminated").count())
    bloom["bloom_screen_sec"] = round(time.perf_counter() - t0, 2)

    total = sum(timings.values())
    n_ops = len(timings)
    out = {"metric": "hygiene_ops", "n_docs": n_docs, "cpus": cpus,
           **timings, **bloom, "total_sec": round(total, 2),
           "docs_per_sec": int(n_ops * n_docs / total), **extras}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| hygiene ops ({n_docs} docs, local[{cpus}]) | repetition "
            f"{timings['repetition_sec']}s, pii {timings['pii_sec']}s, "
            f"decontaminate {timings['decontaminate_sec']}s, spans "
            f"{timings['spans_sec']}s | "
            f"{out['docs_per_sec']} doc-passes/s | bloom decontaminate "
            f"{bloom['decontaminate_bloom_sec']}s exact-verified / "
            f"{bloom['bloom_screen_sec']}s screen-only |\n")


if __name__ == "__main__":
    main()
