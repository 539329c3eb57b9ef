#!/usr/bin/env python
"""Text-pipeline throughput bench: the assemble → span-dedup/cut → PII
scrub → REAL BPE tokenize → pack_sequences chain over a synthetic
documents table (the text twin of bench_multimodal.py — VERDICT r4
next-round #6). Measures per-stage time and end-to-end docs/s at two
parallelism levels and reports the N→4N scaling efficiency the north
rule asks for on the TEXT path.

Corpus: deterministic word-salad docs with planted hazards (exact dups,
mass boilerplate passage, PII, degenerate repetition) written once as
sharded parquet under corpus/ and reused.

Env: SPARK_GRAFT_TEXT_DOCS (default 200000), SPARK_GRAFT_TEXT_LEVELS
(default "4,16").

One JSON line to stdout; appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))

from delver_spark.fixtures.textgen import (DUP_STRIDE, VOCAB,
                                            plant_hazards)


def ensure_corpus(n: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(HERE, "corpus", f"textbench_n{n}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(99)
    n_shards = max(8, n // 25000)
    per = (n + n_shards - 1) // n_shards
    vocab = np.array(VOCAB)
    idx = 0
    for s in range(n_shards):
        m = min(per, n - idx)
        # vectorized doc generation: m docs x 60 words
        w = vocab[rng.integers(0, len(vocab), (m, 60))]
        texts = [" ".join(row) for row in w]
        for j in range(m):
            texts[j] = plant_hazards(idx + j, texts[j])
        for j in range(0, m - 1, DUP_STRIDE):  # exact dups within shard
            texts[j + 1] = texts[j]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(idx, idx + m), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }), os.path.join(d, f"part-{s:04d}.parquet"), row_group_size=4096)
        idx += m
    open(os.path.join(d, "_DONE"), "w").write(str(idx))
    return d


def run_level(corpus: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from delver_spark.functions import bpe
    from delver_spark.operators.assemble import (assemble_training_set,
                                                 pack_sequences)
    from delver_spark.operators.dedup import cut_spans, duplicate_spans
    from delver_spark.operators.textstats import scrubbed_text
    from delver_spark.session import get_spark

    spark = get_spark(f"textbench_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    docs = (spark.read.parquet(corpus)
            .withColumn("n_chars", F.length("text"))
            .localCheckpoint(eager=True))
    n = docs.count()
    bench = spark.createDataFrame(
        [(0, " ".join(VOCAB[:12]))], "doc_id long, text string")

    t0 = time.perf_counter()
    assembled = assemble_training_set(
        docs, bench=bench, skew_safe=True).localCheckpoint(eager=True)
    t_assemble = time.perf_counter() - t0
    kept = (assembled.filter("drop_stage IS NULL")
            .select("doc_id", "text").localCheckpoint(eager=True))
    n_kept = kept.count()

    t0 = time.perf_counter()
    spans = duplicate_spans(kept, window=8, skew_safe=True)
    cut = cut_spans(kept, spans).localCheckpoint(eager=True)
    t_spans = time.perf_counter() - t0

    t0 = time.perf_counter()
    clean = (cut.withColumn("text", scrubbed_text("text"))
             .localCheckpoint(eager=True))
    t_pii = time.perf_counter() - t0

    t0 = time.perf_counter()
    merges = bpe.train_bpe_spark(clean, n_merges=200)
    counts = bpe.token_counts(clean, merges).localCheckpoint(eager=True)
    t_bpe = time.perf_counter() - t0
    n_tokens = int(counts.agg(F.sum("n_bpe_tokens")).collect()[0][0])

    t0 = time.perf_counter()
    packed = pack_sequences(counts, "n_bpe_tokens", "doc_id", 2048,
                            scale_safe=True)
    max_seq = packed.agg(F.max("seq_last")).collect()[0][0]
    n_seq = int(max_seq) + 1 if max_seq is not None else 0  # empty kept set
    t_pack = time.perf_counter() - t0

    spark.stop()
    total = t_assemble + t_spans + t_pii + t_bpe + t_pack
    return {"cpus": cpus, "n": n, "kept": n_kept, "tokens": n_tokens,
            "sequences": n_seq,
            "assemble_s": round(t_assemble, 2),
            "spans_s": round(t_spans, 2),
            "pii_s": round(t_pii, 2),
            "bpe_s": round(t_bpe, 2),
            "pack_s": round(t_pack, 2),
            "total_s": round(total, 2),
            "docs_per_s": round(n / total, 1)}


def main():
    n = int(os.environ.get("SPARK_GRAFT_TEXT_DOCS", 200000))
    levels = [int(x) for x in
              os.environ.get("SPARK_GRAFT_TEXT_LEVELS", "4,16").split(",")]
    corpus = ensure_corpus(n)

    res = [run_level(corpus, c) for c in levels]
    lo, hi = res[0], res[-1]
    ratio = hi["cpus"] / lo["cpus"]
    eff = (hi["docs_per_s"] / lo["docs_per_s"]) / ratio
    out = {"metric": "text_pipeline", "docs": n,
           "levels": res, "scaling_eff": round(eff, 3)}
    print(json.dumps(out))
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| text pipeline ({n} docs) | "
            f"local[{lo['cpus']}] {lo['docs_per_s']} docs/s, "
            f"chain {lo['total_s']}s | local[{hi['cpus']}] "
            f"{hi['docs_per_s']} docs/s, chain {hi['total_s']}s | "
            f"N→{int(ratio)}N efficiency {out['scaling_eff']} |\n")


if __name__ == "__main__":
    main()
