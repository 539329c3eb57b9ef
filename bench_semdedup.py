#!/usr/bin/env python
"""SemDeDup scale bench: the within-cell pair stage is O(Σ n_c²), so
the CELL COUNT is the scale knob (Abbas et al. use k ∝ n — 50k clusters
for LAION). This bench records both halves of that claim on one corpus:

1. k-sweep at one core count: total pair evaluations and wall time vs
   k (pairs drop ~1/k — quadratic-per-cell, linear cells);
2. 2v8 scaling at the largest k (the production shape: many small
   cells, join parallelism = cells).

Corpus: the bench_kmeans clustered vectors + 1%% planted near-dups
(one sign-flipped dimension — cos ≈ 1-2x_i² ≈ 0.97 > the 0.95 gate, the
same plant as the driver gate), cells fit by kmeans_cells so the
pipeline measured is the real one: kmeans_cells → semdedup.

Env: SPARK_GRAFT_SD_ROWS (default 100000), SPARK_GRAFT_SD_KSWEEP
(default "64,256,1024"), SPARK_GRAFT_SD_LEVELS (default "2,8").
One JSON line; appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))


def ensure_corpus(n: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bench_kmeans import ensure_corpus as base_corpus

    d = os.path.join(HERE, "corpus", f"sdbench_n{n}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    base = base_corpus(n)
    # restart-safe: a partial dir without _DONE must rebuild cleanly
    # (symlinks would otherwise FileExistsError on the rerun)
    import shutil
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{base}/*.parquet') "
        f"WHERE vec_id % 100 = 0 ORDER BY vec_id").fetchall()
    # near-dup plant: negate ONE dimension (exact float op, cos ~ 0.97)
    ids, vecs = [], []
    for vid, emb in rows:
        v = list(emb)
        v[vid % len(v)] = -v[vid % len(v)]
        ids.append(n + vid)
        vecs.append(v)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }), os.path.join(d, "plant.parquet"), row_group_size=4096)
    for f in os.listdir(base):
        if f.endswith(".parquet"):
            os.symlink(os.path.join(base, f), os.path.join(d, f))
    open(os.path.join(d, "_DONE"), "w").write(str(n + len(ids)))
    return d


def run(corpus: str, cpus: int, ks: list[int]) -> list[dict]:
    from pyspark.sql import functions as F

    from delver_spark.operators.dedup import semdedup
    from delver_spark.operators.similarity import kmeans_cells
    from delver_spark.session import get_spark

    spark = get_spark(f"sdbench_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    emb = spark.read.parquet(corpus).localCheckpoint(eager=True)
    n = emb.count()
    out = []
    for k in ks:
        t0 = time.perf_counter()
        labels = kmeans_cells(emb, k=k, n_iter=2).localCheckpoint(eager=True)
        t_fit = time.perf_counter() - t0
        cells = labels.groupBy("label").count()
        pair_evals = int(cells.agg(F.sum(
            F.col("count") * (F.col("count") - 1) / 2)).collect()[0][0])
        labeled = emb.join(labels, "vec_id").localCheckpoint(eager=True)
        t_sd = float("inf")
        for _ in range(2):            # best-of-2 (CLAUDE.md bench rule)
            t0 = time.perf_counter()
            res = semdedup(labeled)
            agg = res.agg(F.count("*").alias("n"),
                          F.sum(F.col("keep").cast("long")).alias("kept")
                          ).collect()[0]
            t_sd = min(t_sd, time.perf_counter() - t0)
        out.append({"cpus": cpus, "n": n, "k": k,
                    "pair_evals": pair_evals,
                    "pair_frac": round(pair_evals / (n * (n - 1) / 2), 6),
                    "fit_s": round(t_fit, 2), "semdedup_s": round(t_sd, 2),
                    "rows": agg["n"], "dropped": agg["n"] - int(agg["kept"])})
    spark.stop()
    return out


def main():
    n = int(os.environ.get("SPARK_GRAFT_SD_ROWS", 100000))
    ks = [int(x) for x in
          os.environ.get("SPARK_GRAFT_SD_KSWEEP", "64,256,1024").split(",")]
    levels = [int(x) for x in
              os.environ.get("SPARK_GRAFT_SD_LEVELS", "2,8").split(",")]
    corpus = ensure_corpus(n)
    sweep = run(corpus, levels[-1], ks)          # k-sweep at the high level
    lo = run(corpus, levels[0], [ks[-1]])[0]     # 2v8 at the largest k
    hi = sweep[-1]
    assert lo["rows"] == hi["rows"] and lo["dropped"] == hi["dropped"]
    ratio = hi["cpus"] / lo["cpus"]
    eff = round((lo["semdedup_s"] / hi["semdedup_s"]) / ratio, 3)
    out = {"metric": "semdedup", "rows": hi["rows"], "ksweep": sweep,
           "low_level": lo, "scaling_eff_at_kmax": eff}
    print(json.dumps(out))
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a") as f:
        sw = "; ".join(
            f"k={r['k']}: {r['pair_evals']/1e6:.1f}M pairs "
            f"({r['pair_frac']*100:.2f}% of n²/2), {r['semdedup_s']}s"
            for r in sweep)
        f.write(
            f"\n| semdedup over kmeans cells ({hi['rows']} vecs, "
            f"{hi['dropped']} dropped, local[{hi['cpus']}]) | {sw} | "
            f"k={hi['k']} at local[{lo['cpus']}]: {lo['semdedup_s']}s | "
            f"N→{int(ratio)}N efficiency {eff} at k={hi['k']} |\n")


if __name__ == "__main__":
    main()
