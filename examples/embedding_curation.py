#!/usr/bin/env python
"""Embedding-curation demo: the full semantic half of the engine as
one flow, the way it runs at corpus scale —

  synth embeddings (planted near-dups)
    → kmeans_cells on a DETERMINISTIC SAMPLE   (fit is the only
      iterative step; at 10^10 vectors you fit on a hash-sample)
    → kmeans_assign over the FULL table        (one narrow pass with
      the frozen centroids — embarrassingly parallel)
    → semdedup within the fitted cells         (Abbas et al. 2023;
      one shuffle by cell + per-cell numpy kernel)
    → keep-set → build_ivf_index → multi-probe cosine search

No stage shuffles vectors more than once, holds them on the driver,
or refits anything on append (appended batches go through
kmeans_assign + merge_ivf_index). Usage:
``python examples/embedding_curation.py [n_vectors]`` (default 20000).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

DIM = 64
K = 64


def synth_embeddings(n: int):
    """Clustered unit vectors + 1% planted near-dups (one sign-flipped
    dimension — exact float op, cos ≈ 1-2x_i² ≈ 0.97)."""
    import numpy as np

    rng = np.random.default_rng(31)
    centers = rng.normal(size=(K, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    c = rng.integers(0, K, n)
    v = centers[c] + rng.normal(scale=0.15, size=(n, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in v[i]]) for i in range(n)]
    for i in range(0, n, 100):
        dup = list(rows[i][1])
        dup[i % DIM] = -dup[i % DIM]
        rows.append((n + i, dup))
    return rows


def main(n: int = 20000) -> None:
    from pyspark.sql import functions as F

    from delver_spark.operators.dedup import semdedup
    from delver_spark.operators.similarity import (build_ivf_index,
                                                   cosine_topk_ivf,
                                                   kmeans_assign,
                                                   kmeans_cells,
                                                   split_oversized_cells)
    from delver_spark.session import get_spark

    spark = get_spark("embedding_curation_demo")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        emb = spark.createDataFrame(
            synth_embeddings(n),
            "vec_id long, embedding array<float>").localCheckpoint(True)

        # 1. fit the coarse quantizer on a 10% deterministic sample
        #    (hash-rate cut — partition-invariant, reproducible)
        t0 = time.time()
        sample = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(10)) == 0)
        _, cents = kmeans_cells(sample, k=K, n_iter=3,
                                return_centroids=True)
        t1 = time.time()
        print(f"[1 fit      {t1 - t0:6.2f}s] k={K} on "
              f"{sample.count()} sampled of {emb.count()} vectors")

        # 2. one assignment pass labels the FULL table
        labels = kmeans_assign(emb, cents).localCheckpoint(True)
        sizes = labels.groupBy("label").count()
        stats = sizes.agg(F.min("count"), F.max("count")).collect()[0]
        t2 = time.time()
        print(f"[2 assign   {t2 - t1:6.2f}s] cell sizes "
              f"{stats[0]}..{stats[1]}")

        # 2b. enforce the k ∝ n cell-size contract: semdedup's pair
        # stage is O(sum n_c^2) — a hot cell from a skewed corpus
        # would dominate; bisect any cell over the cap before dedup
        max_cell = max(64, 4 * n // K)
        labels = split_oversized_cells(emb, labels, max_cell=max_cell)
        stats = (labels.groupBy("label").count()
                 .agg(F.min("count"), F.max("count")).collect()[0])
        t2b = time.time()
        print(f"[2b split   {t2b - t2:6.2f}s] cell cap {max_cell}, "
              f"sizes now {stats[0]}..{stats[1]}")

        # 3. semantic dedup within cells
        labeled = emb.join(labels, "vec_id")
        sd = semdedup(labeled).localCheckpoint(True)
        dropped = sd.filter(~F.col("keep")).count()
        t3 = time.time()
        # fewer drops than plants is SemDeDup's documented tradeoff:
        # a pair split across two cells is never compared (the paper
        # accepts this for the O(sum n_c^2) bound; raise k more slowly
        # or use dedup.embedding_lsh_pairs for cell-free recall)
        print(f"[3 semdedup {t3 - t2b:6.2f}s] {dropped} near-dups "
              f"dropped of {n // 100} planted (cell-scoped recall; "
              f"cross-cell pairs are out of scope by design)")

        # 4. kept set → IVF index → multi-probe search (query a
        # known-kept id — vec 0 has a planted dup and may itself be
        # the dropped member)
        kept = labeled.join(sd.filter("keep").select("vec_id"), "vec_id")
        qid = kept.agg(F.min("vec_id")).collect()[0][0]
        index = build_ivf_index(kept)
        hits = cosine_topk_ivf(kept, query_id=qid, k=5, n_probe=3,
                               index=index).collect()
        t4 = time.time()
        print(f"[4 search   {t4 - t3:6.2f}s] top-5 for vec {qid} over "
              f"{kept.count()} kept: "
              f"{[(r['vec_id'], r['dot_milli2']) for r in hits]}")
        print(f"[total      {t4 - t0:6.2f}s] fit→assign→dedup→index→probe")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20000)
