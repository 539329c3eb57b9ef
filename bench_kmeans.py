#!/usr/bin/env python
"""kmeans_cells scaling bench: the deterministic spherical k-means fit
(similarity.kmeans_cells, r5) at two core counts on the same corpus.

What it evidences: each Lloyd's iteration is ONE fused mapInArrow pass
(assign + local scatter-add emitting <= k*dim partial-sum rows per
batch) plus a k*dim groupBy — rows never shuffle, so the fit should
scale like the embarrassingly parallel pass it is, bounded only by the
per-iteration job-launch fixed cost. The r5 review flagged the first
implementation's update step (full-table id-join + n*dim posexplode,
two row-level shuffles per iteration); this bench records the fused
design's scaling as a fact.

Also asserts the fit is bit-identical across core counts (the
determinism contract; the differential pin vs the big-int reference
lives in tests/test_dedup_scale.py).

Env: SPARK_GRAFT_KM_ROWS (default 200000), SPARK_GRAFT_KM_LEVELS
(default "2,8"), SPARK_GRAFT_KM_K (default 64), SPARK_GRAFT_KM_ITERS
(default 3). One JSON line; appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
DIM = 64


def ensure_corpus(n: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(HERE, "corpus", f"kmbench_n{n}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(123)
    # clustered data (64 planted centers + noise) so the fit does real
    # reassignment work instead of converging instantly
    centers = rng.normal(size=(64, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    n_shards = max(8, n // 25000)
    per = (n + n_shards - 1) // n_shards
    idx = 0
    for s in range(n_shards):
        m = min(per, n - idx)
        c = rng.integers(0, 64, m)
        v = centers[c] + rng.normal(scale=0.15, size=(m, DIM))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pq.write_table(pa.table({
            "vec_id": pa.array(range(idx, idx + m), pa.int64()),
            "embedding": pa.array([row for row in v.astype(np.float32)],
                                  pa.list_(pa.float32())),
        }), os.path.join(d, f"part-{s:04d}.parquet"), row_group_size=4096)
        idx += m
    open(os.path.join(d, "_DONE"), "w").write(str(idx))
    return d


def run_level(corpus: str, cpus: int, k: int, iters: int) -> dict:
    from pyspark.sql import functions as F

    from delver_spark.operators.similarity import kmeans_cells
    from delver_spark.session import get_spark

    spark = get_spark(f"kmbench_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    emb = spark.read.parquet(corpus)
    n = emb.count()
    best = float("inf")
    sig = None
    for _ in range(2):                       # best-of-2 (box phase noise)
        t0 = time.perf_counter()
        out = kmeans_cells(emb, k=k, n_iter=iters)
        row = out.agg(
            F.count("*").alias("n"),
            F.sum(F.col("vec_id") * F.col("label")).alias("chk"),
            F.countDistinct("label").alias("cells")).collect()[0]
        best = min(best, time.perf_counter() - t0)
        sig = (row["n"], int(row["chk"]), row["cells"])
    spark.stop()
    return {"cpus": cpus, "n": n, "fit_s": round(best, 2),
            "vec_per_s": round(n / best, 1), "sig": sig}


def main():
    n = int(os.environ.get("SPARK_GRAFT_KM_ROWS", 200000))
    k = int(os.environ.get("SPARK_GRAFT_KM_K", 64))
    iters = int(os.environ.get("SPARK_GRAFT_KM_ITERS", 3))
    levels = [int(x) for x in
              os.environ.get("SPARK_GRAFT_KM_LEVELS", "2,8").split(",")]
    corpus = ensure_corpus(n)
    res = [run_level(corpus, c, k, iters) for c in levels]
    lo, hi = res[0], res[-1]
    assert lo["sig"] == hi["sig"], \
        f"fit not deterministic across core counts: {lo['sig']} {hi['sig']}"
    ratio = hi["cpus"] / lo["cpus"]
    eff = round((hi["vec_per_s"] / lo["vec_per_s"]) / ratio, 3)
    out = {"metric": "kmeans_fit", "rows": n, "k": k, "iters": iters,
           "levels": res, "scaling_eff": eff}
    print(json.dumps(out))
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| kmeans_cells fit ({n} vecs dim{DIM}, k={k}, "
            f"{iters} iters, fused partial-sum pass) | "
            f"local[{lo['cpus']}] {lo['vec_per_s']} vec/s | "
            f"local[{hi['cpus']}] {hi['vec_per_s']} vec/s | "
            f"N→{int(ratio)}N efficiency {eff}; assignments "
            f"bit-identical across levels |\n")


if __name__ == "__main__":
    main()
