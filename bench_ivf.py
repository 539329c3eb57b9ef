#!/usr/bin/env python
"""IVF index bench (VERDICT r2 done-criterion for "what's wrong" #1):
at N >= 100k vectors, measure (a) one-off ingest-time index build,
(b) per-probe latency with the precomputed index (cell ranking is
driver arithmetic + a pruned cell scan), vs (c) the legacy per-query
full-table aggregation path. Appends one row to BENCH/BASELINE.md.

Env: SPARK_GRAFT_IVF_N (default 100000), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import tempfile

    import numpy as np
    import pandas as pd

    from delver_spark.operators import similarity as S
    from delver_spark.session import get_spark

    n = int(os.environ.get("SPARK_GRAFT_IVF_N", 100_000))
    n_cells = 256
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("delver_bench_ivf", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rng = np.random.default_rng(11)
    base = rng.normal(size=(n, 64)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    tmp = tempfile.mkdtemp(prefix="ivf_bench_")
    path = os.path.join(tmp, "emb.parquet")
    # parquet-backed so the literal cell filter actually prunes the
    # scan; bucketed by cell (repartition on label) — the ingest-time
    # layout contract: each cell resident in one partition keeps the
    # batch path's partial top-k volume at n_q × n_probe × k
    spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(n),
        "embedding": list(base),
        "label": (np.arange(n) % n_cells).astype(np.int32),
    })).repartition(max(cpus, 8), "label") \
        .write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)

    t0 = time.perf_counter()
    idx = S.build_ivf_index(emb)
    t_build = time.perf_counter() - t0

    # warm + measure per-probe latency with the index (best of 3 probes)
    probe_times = []
    for qid in (0, 1, 2):
        t0 = time.perf_counter()
        S.cosine_topk_ivf(emb, qid, 8, n_probe=3, index=idx).collect()
        probe_times.append(time.perf_counter() - t0)
    t_probe = min(probe_times)

    t0 = time.perf_counter()
    S.cosine_topk_ivf(emb, 0, 8, n_probe=3).collect()  # legacy: agg per query
    t_legacy = time.perf_counter() - t0

    # batch path: nq external queries in ONE corpus pass (best-of-2)
    nq = int(os.environ.get("SPARK_GRAFT_IVF_NQ", 2000))
    qv = rng.normal(size=(nq, 64)).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    queries = spark.createDataFrame(pd.DataFrame({
        "query_id": np.arange(nq) + 10_000_000,
        "embedding": list(qv)})).localCheckpoint(True)
    t_batch = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        got = S.cosine_topk_ivf_batch(emb, queries, k=8, n_probe=3,
                                      index=idx).count()
        t_batch = min(t_batch, time.perf_counter() - t0)
    assert got == nq * 8

    out = {"metric": "ivf_index_probe", "n": n, "n_cells": len(idx),
           "index_build_sec": round(t_build, 2),
           "probe_sec_indexed": round(t_probe, 2),
           "probe_sec_legacy": round(t_legacy, 2),
           "batch_nq": nq, "batch_sec": round(t_batch, 2),
           "batch_queries_per_sec": round(nq / t_batch, 1),
           "cpus": cpus}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| IVF probe (n={n}, {len(idx)} cells, local[{cpus}]) | "
            f"index build {out['index_build_sec']}s one-off | "
            f"probe {out['probe_sec_indexed']}s with index vs "
            f"{out['probe_sec_legacy']}s legacy full-table ranking | "
            f"batch {nq} queries {out['batch_sec']}s "
            f"({out['batch_queries_per_sec']} q/s, one corpus pass) |\n")


if __name__ == "__main__":
    main()
