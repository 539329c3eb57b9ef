#!/usr/bin/env python
"""Sub-quadratic dedup evidence bench (VERDICT r1 #1 done-criterion):
at N vectors, count the CANDIDATE pairs the LSH bucket join actually
generates vs the all-pairs N(N-1)/2 a cartesian plan would scan, plus
wall time for the full candidates+verify pipeline. Same shape for the
pHash banded join. Appends one row to BENCH/BASELINE.md.

Env: SPARK_GRAFT_DEDUP_N (default 50000), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    from delver_spark.operators import dedup as D
    from delver_spark.session import get_spark

    n = int(os.environ.get("SPARK_GRAFT_DEDUP_N", 50_000))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("delver_bench_dedup", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rng = np.random.default_rng(7)
    base = rng.normal(size=(n, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # every 20th vector is a planted near-dup of its predecessor
    dup = np.arange(n) % 20 == 19
    base[dup] = base[np.flatnonzero(dup) - 1] \
        + rng.normal(scale=0.02, size=(int(dup.sum()), 64))
    base[dup] /= np.linalg.norm(base[dup], axis=1, keepdims=True)
    import pandas as pd
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(n),
        "embedding": list(base.astype(np.float32)),
        "label": np.arange(n) % 10,
    })).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    n_cand = D.embedding_lsh_pairs(emb, threshold_milli=-1001).count()
    t_cand = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_pairs = D.embedding_lsh_pairs(emb).count()
    t_full = time.perf_counter() - t0

    all_pairs = n * (n - 1) // 2
    # pHash banded join at the same N (60-bit hashes, planted 0-distance)
    ph = rng.integers(0, 1 << 60, size=n, dtype=np.int64)
    ph[dup] = ph[np.flatnonzero(dup) - 1]
    phdf = spark.createDataFrame(pd.DataFrame(
        {"doc_id": np.arange(n), "phash": ph})).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    n_ph = D.phash_hamming_pairs(phdf).count()
    t_ph = time.perf_counter() - t0

    out = {"metric": "dedup_subquadratic", "n": n,
           "all_pairs": all_pairs,
           "lsh_candidates": n_cand,
           "candidate_fraction": round(n_cand / all_pairs, 8),
           "lsh_verified_pairs": n_pairs,
           "planted_pairs": int(dup.sum()),
           "lsh_candidates_sec": round(t_cand, 2),
           "lsh_full_sec": round(t_full, 2),
           "phash_pairs": n_ph, "phash_sec": round(t_ph, 2),
           "cpus": cpus}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| dedup sub-quadratic (n={n}, local[{cpus}]) | LSH candidates "
            f"{n_cand} of {all_pairs} possible ({out['candidate_fraction']:.2e}) "
            f"in {out['lsh_candidates_sec']}s | verified {n_pairs} pairs "
            f"(planted {int(dup.sum())}) in {out['lsh_full_sec']}s | "
            f"phash pairs {n_ph} in {out['phash_sec']}s |\n")


if __name__ == "__main__":
    main()
