#!/usr/bin/env python
"""Runnable end-to-end TEXT training-data pipeline demo — the text twin
of examples/image_pipeline.py (VERDICT r4 next-round #6):

  synth corpus → assemble_training_set (Gopher repetition → exact-dup
  keeper → n-gram decontamination vs a benchmark set → sample) →
  CCNet LM quality cut (trigram Stupid-Backoff scored in one
  zero-shuffle pass; tail tercile dropped) →
  duplicate_spans + cut_spans (substring dedup) → PII scrub →
  REAL BPE tokenization (train + encode) → pack_sequences
  (fixed context-length sample cutting)

Usage: ``python examples/text_pipeline.py [n_docs]`` (default 3000).
Prints per-stage honest timings: every stage's input is
localCheckpoint-ed first, so a stage's time never silently includes
recomputing its upstream (code-review r4-s5 rule). At cluster scale the
corpus is a parquet/Iceberg documents table and each stage is the same
one- or two-shuffle plan over it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from delver_spark.fixtures.textgen import (DUP_STRIDE, VOCAB,
                                            plant_hazards)


def synth_docs(n: int):
    """Deterministic corpus with every hazard the chain exists to
    catch: exact duplicates, a mass-repeated boilerplate passage,
    benchmark-contaminated docs, PII, and degenerate repetitive docs."""
    import numpy as np

    rng = np.random.default_rng(7)
    docs = []
    for i in range(n):
        words = [VOCAB[int(k)] for k in rng.integers(0, len(VOCAB), 60)]
        text = " ".join(words)
        docs.append((i, plant_hazards(i, text)))
    for i in range(0, n - 1, DUP_STRIDE):     # 5% exact duplicates
        docs[i + 1] = (docs[i + 1][0], docs[i][1])
    return docs


def main(n: int = 3000) -> None:
    from pyspark.sql import functions as F

    from delver_spark.functions import bpe
    from delver_spark.operators.assemble import (assemble_training_set,
                                                 assembly_report,
                                                 pack_sequences,
                                                 shuffle_order)
    from delver_spark.operators.dedup import cut_spans, duplicate_spans
    from delver_spark.functions import ngram_lm
    from delver_spark.operators.textstats import (deterministic_sample,
                                                  mixture_upsample,
                                                  scrubbed_text)
    from delver_spark.session import get_spark

    spark = get_spark("text_pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = (spark.createDataFrame(synth_docs(n),
                                      "doc_id long, text string")
                .withColumn("n_chars", F.length("text"))
                .repartition(8).localCheckpoint(eager=True))
        # the benchmark set: doc 0's first 12 words = a "test question"
        first12 = " ".join(synth_docs(1)[0][1].split()[:12])
        bench = spark.createDataFrame([(0, first12)],
                              "doc_id long, text string")

        # 1. assembly: repetition gates -> exact-dup keeper -> n-gram
        # decontamination -> (no quota) -> (no rate sample)
        t0 = time.perf_counter()
        assembled = assemble_training_set(
            docs, bench=bench, skew_safe=True).localCheckpoint(eager=True)
        t1 = time.perf_counter() - t0
        report = {r["drop_stage"]: r["n"]
                  for r in assembly_report(assembled).collect()}
        print(f"1. assemble          {t1:6.2f}s  drop report: {report}")
        kept = assembled.filter("drop_stage IS NULL").select(
            "doc_id", "text").localCheckpoint(eager=True)

        # 1b. CCNet LM quality cut: train trigram Stupid-Backoff counts
        # on a 10% deterministic sample, score every kept doc (one
        # zero-shuffle pass), label head/middle/tail by exact GLOBAL
        # RANK of mean token probability (lm_partition — partition-
        # invariant and distributed, no percentile agg), drop the tail
        t0 = time.perf_counter()
        counts_lm = ngram_lm.train_ngram_lm(deterministic_sample(kept, 100))
        scored = ngram_lm.lm_score(kept, counts_lm, min_count=2)
        buckets = ngram_lm.lm_partition(scored)
        lm_kept = buckets.filter("lm_bucket <> 'tail'") \
            .select("doc_id", "lm_bucket")
        kept = (kept.join(lm_kept, "doc_id")
                .localCheckpoint(eager=True))
        t1b = time.perf_counter() - t0
        n_lm = kept.count()
        print(f"1b. lm quality cut   {t1b:6.2f}s  kept {n_lm} head+middle "
              f"docs (rank-tercile split over mean token probability)")

        # 2. substring dedup: find repeated >=8-word passages anywhere
        # in the corpus, cut every occurrence
        t0 = time.perf_counter()
        spans = duplicate_spans(kept, window=8, skew_safe=True)
        cut = cut_spans(kept, spans).localCheckpoint(eager=True)
        t2 = time.perf_counter() - t0
        n_spans = spans.count()
        print(f"2. span dedup        {t2:6.2f}s  {n_spans} spans cut "
              f"(boilerplate removed from every copy)")

        # 3. PII scrub (drop-in Column rewrite; no shuffle)
        t0 = time.perf_counter()
        clean = (cut.withColumn("text", scrubbed_text("text"))
                 .localCheckpoint(eager=True))
        t3 = time.perf_counter() - t0
        n_pii = clean.filter(F.col("text").contains("<EMAIL>")
                             | F.col("text").contains("<PHONE>")).count()
        print(f"3. pii scrub         {t3:6.2f}s  {n_pii} docs redacted")

        # 4. REAL BPE: train merges on the cleaned corpus (distributed
        # word counts, driver merge loop), then encode + count
        t0 = time.perf_counter()
        merges = bpe.train_bpe_spark(clean, n_merges=200)
        counts = bpe.token_counts(clean, merges).localCheckpoint(eager=True)
        t4 = time.perf_counter() - t0
        tot = counts.agg(F.sum("n_bpe_tokens")).collect()[0][0]
        print(f"4. bpe tokenize      {t4:6.2f}s  {len(merges)} merges, "
              f"{tot} tokens")

        # 4b. mixture weighting: repeat the LM head 2.5x (the CCNet /
        # LLaMA recipe — high-quality sources get extra epochs), then
        # SHUFFLE the (doc_id, epoch) copies into a seeded
        # deterministic permutation so adjacent training samples
        # decorrelate from crawl order (and epoch copies scatter)
        t0 = time.perf_counter()
        mixed = (mixture_upsample(
            counts.join(clean.select("doc_id", "lm_bucket"), "doc_id"),
            {"head": 2500, "middle": 1000}, group_col="lm_bucket")
            .withColumn("_cid", F.col("doc_id") * 8 + F.col("epoch")))
        mixed = (shuffle_order(mixed, id_col="_cid", seed=1)
                 .localCheckpoint(eager=True))
        t4b = time.perf_counter() - t0
        n_docs, n_mix = counts.count(), mixed.count()
        print(f"4b. mix + shuffle    {t4b:6.2f}s  {n_docs} docs -> "
              f"{n_mix} doc-epochs (head x2.5, seeded permutation)")

        # 5. cut fixed 512-token training samples over the shuffled
        # doc-epoch stream
        t0 = time.perf_counter()
        packed = pack_sequences(mixed, "n_bpe_tokens", "shuffle_rank",
                                512, scale_safe=True)
        max_seq = packed.agg(F.max("seq_last")).collect()[0][0]
        n_seq = int(max_seq) + 1 if max_seq is not None else 0
        t5 = time.perf_counter() - t0
        print(f"5. pack sequences    {t5:6.2f}s  {n_seq} samples of 512 "
              f"tokens")
        print(f"total {t1 + t1b + t2 + t3 + t4 + t4b + t5:.2f}s "
              f"for {n} docs")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
