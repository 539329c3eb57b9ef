#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "phase_control": {...}, "reps": 2}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores),
     SPARK_GRAFT_BENCH_CRAWL=0 to skip the crawl-throughput section,
     SPARK_GRAFT_BENCH_REPS  (default 2) reps per query, min taken.

Each query is forced end-to-end with the noop sink (full compute, no sink
cost). PHASE ROBUSTNESS (round-5 fix for the BENCH_r04 artifact, which
recorded a 2.1x box-phase inflation as if it were the engine): every
headline query runs best-of-REPS within the session, and a fixed
single-core numpy workload (`phase_control`) is timed at start and end so
any reader can normalize a recording against the box's phase — an
untouched query whose time moves with phase_control is weather, not code.
The crawl section measures the BASELINE.json metric — URLs fetched/sec and
frontier-ops/sec — over a fixed-round crawl on a cached Zipf-skewed
corpus, also best-of-REPS. Scaling efficiency (local[8] vs local[32]) is
measured separately by bench_scaling.py into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "o2_politeness_window",
    "a1_metric_date_histogram",
    "j2_robots_lookup",
    "j3_seen_anti_join",
    "dedup_exact",
    "text_token_count",
    "ann_cosine_topk",
    "text_quality_score",
    "dedup_embedding_lsh",
]

BENCH_CORPUS = {"n_pages": 20000, "n_hosts": 200, "seed": 42, "n_seeds": 100,
                "per_host_budget": 16, "global_budget": 2048,
                "max_rounds": 1000, "max_depth": 3}
BENCH_ROUNDS = 8


def phase_control() -> float:
    """Fixed single-core numpy workload, best-of-3 seconds.

    Deterministic input (no RNG), sized ~0.5 s on an idle box. The ratio
    start/end vs a prior recording's phase_control normalizes cross-phase
    comparisons; within-run start-vs-end drift flags a polluted run.
    """
    import numpy as np

    # Elementwise transcendentals only — numpy ufuncs are single-threaded
    # (matmul would go through multithreaded BLAS and measure core count,
    # not phase).
    a = (np.arange(8_000_000, dtype=np.float64) % 997) / 997.0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        b = a
        for _ in range(12):
            b = np.sqrt(b * b + 0.25)
        float(b.sum())
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def ensure_bench_corpus(root: str) -> str:
    from delver_spark.fixtures.gen import generate_corpus

    d = os.path.join(root, "bench_n{n_pages}_h{n_hosts}_s{n_seeds}_b{per_host_budget}x{global_budget}".format(**BENCH_CORPUS))
    if not os.path.exists(os.path.join(d, "params.json")):
        generate_corpus(d, **BENCH_CORPUS)
    return d


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))

    from delver_spark.session import get_spark
    import __spark_entry__ as entrymod

    pc_start = phase_control()

    spark = get_spark("delver_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM, codegen, Arrow
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    entrymod.queries()["q1_pricing_summary"](spark, sf_dir).write \
        .format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    qs = entrymod.queries()
    for name in HEADLINE:
        # fall back to the module-level single-op function when a name
        # was consolidated out of the 50-entry gate dict (a1 since r4) —
        # keeps the per-query headline series comparable across rounds
        fn = qs.get(name) or getattr(entrymod, name)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    crawl_stats = {}
    if os.environ.get("SPARK_GRAFT_BENCH_CRAWL", "1") != "0":
        from delver_spark.operators.crawl import CrawlEngine

        corpus = ensure_bench_corpus(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "corpus"))
        best_dt = float("inf")
        for _ in range(reps):
            wd = tempfile.mkdtemp(prefix="delver_bench_crawl_")
            try:
                eng = CrawlEngine(spark, corpus, wd, collect_documents=False)
                eng.seed()
                t0 = time.perf_counter()
                rounds = 0
                while rounds < BENCH_ROUNDS and eng.run_round():
                    rounds += 1
                dt = time.perf_counter() - t0
                if dt < best_dt:
                    best_dt = dt
                    crawl_stats = {
                        "rounds": rounds,
                        "urls_fetched": eng.fetch_seq,
                        "urls_per_sec": round(eng.fetch_seq / dt, 1),
                        "frontier_ops": eng.seq + eng.fetch_seq,
                        "frontier_ops_per_sec": round(
                            (eng.seq + eng.fetch_seq) / dt, 1),
                    }
            finally:
                shutil.rmtree(wd, ignore_errors=True)
        times["crawl_rounds"] = round(best_dt, 3)

    pc_end = phase_control()
    total = round(sum(times.values()), 3)
    print(json.dumps({"metric": "headline_total", "value": total,
                      "unit": "sec", "queries": times, "sf": sf,
                      "cpus": cpus, "crawl": crawl_stats, "reps": reps,
                      "phase_control": {"start": pc_start, "end": pc_end,
                                        "unit": "sec"}}))


if __name__ == "__main__":
    main()
