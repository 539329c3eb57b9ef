#!/usr/bin/env python
"""Frontier-schedule benchmark: the BASELINE.json metric names
"frontier-ops/sec on a 10^10-row synthetic frontier schedule (small-scale
truth + extrapolated shape)". This measures the truth at 10^7 rows — the
pure scheduling operators with NO payload attached:

  - politeness dequeue (per-host top-B window + global top-G) over a
    Zipf-skewed frontier with one deliberately hot host (~10% of all
    rows), plain and with the exact salted hot-host guard;
  - the frontier delta update (dequeued anti-join + admitted union +
    checkpoint), i.e. one round's state transition.

Extrapolated shape to 10^10: every stage here is a hash shuffle on
host/enqueue_seq plus narrow passes — cost is linear in rows with NO
driver-resident state (the driver holds counters only). The salted
hot-host guard (opt-in, exactness asserted below) bounds a hot host's
final-window input to n_salts x B rows regardless of how hot it is.
Bloom scale: §4.2.3 of SURVEY.md — broadcast to ~10^9 keys, then the
bit-identical distributed-bitmap probe (frontier.bloom_probe_distributed).
The frontier delta update measured here REWRITES the surviving rows
(versioned-parquet snapshot layout); on the 10^10 deployment the same
commit is an Iceberg merge-on-read DELETE of the G dequeued keys plus
an APPEND of the admitted delta — O(G), not O(frontier) — with the
identical read semantics this engine's anti-join expresses.

Prints one JSON line; appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = int(os.environ.get("SPARK_GRAFT_FRONTIER_ROWS", 10_000_000))
N_HOSTS = int(os.environ.get("SPARK_GRAFT_FRONTIER_HOSTS", 100_000))
B = int(os.environ.get("SPARK_GRAFT_FRONTIER_B", 16))
G = int(os.environ.get("SPARK_GRAFT_FRONTIER_G", 1_000_000))


def main():
    from pyspark.sql import functions as F

    from delver_spark.operators.frontier import dequeue
    from delver_spark.session import get_spark

    spark = get_spark("bench_frontier")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism
    spark.range(100).mapInPandas(lambda it: it, "id long").count()

    # synthetic 10^7 frontier, built JVM-side: host 0 is hot (~10% of all
    # rows), the rest hash-spread over N_HOSTS
    host_id = F.when(F.pmod("id", F.lit(10)) == 0, F.lit(0)) \
        .otherwise(F.pmod(F.abs(F.hash("id")), F.lit(N_HOSTS)))
    frontier = (spark.range(N_ROWS)
                .select(F.lit(0).alias("priority"),
                        F.lit(0).alias("enqueue_round"),
                        F.col("id").alias("enqueue_seq"),
                        F.concat(F.lit("http://h"), host_id,
                                 F.lit(".test/p/"), F.col("id")).alias("url"),
                        F.concat(F.lit("h"), host_id,
                                 F.lit(".test")).alias("host"),
                        F.lit(0).alias("depth"),
                        F.lit(None).cast("string").alias("origin"))
                .repartition(cpus * 4, "host")
                .localCheckpoint(eager=True))
    n = frontier.count()

    # --- politeness dequeue, plain window -------------------------------
    t0 = time.perf_counter()
    batch = dequeue(frontier, B, G).localCheckpoint(eager=True)
    dequeued = batch.count()
    t_dequeue = time.perf_counter() - t0

    # --- with the salted hot-host guard (hot host = 1M rows, > threshold)
    t0 = time.perf_counter()
    guarded = dequeue(frontier, B, G, hot_host_threshold=500_000) \
        .localCheckpoint(eager=True)
    n_guarded = guarded.count()
    t_guarded = time.perf_counter() - t0
    assert n_guarded == dequeued
    # exactness: same rows, same order
    assert guarded.join(batch, ["enqueue_seq", "pos"], "inner").count() \
        == dequeued

    # --- frontier state transition, both designs ---------------------------
    # (a) full rewrite (what a naive snapshot layout pays every round)
    t0 = time.perf_counter()
    rest = frontier.join(batch.select("enqueue_seq"), "enqueue_seq",
                         "left_anti").localCheckpoint(eager=True)
    n_rest = rest.count()
    t_update = time.perf_counter() - t0
    assert n_rest == n - dequeued

    # (b) MOR tombstones (what the engine does): commit = checkpoint the G
    # dequeued seqs; reads go through a broadcast anti-join (map-side
    # filter). Measure the commit and the read-through dequeue of the
    # NEXT batch.
    t0 = time.perf_counter()
    tombs = batch.select("enqueue_seq").localCheckpoint(eager=True)
    tombs.count()
    t_mor_commit = time.perf_counter() - t0
    view = frontier.join(F.broadcast(tombs), "enqueue_seq", "left_anti")
    t0 = time.perf_counter()
    batch2 = dequeue(view, B, G).localCheckpoint(eager=True)
    n2 = batch2.count()
    t_view_dequeue = time.perf_counter() - t0
    assert n2 == min(G, n - dequeued)

    out = {"metric": "frontier_ops", "unit": "rows/sec",
           "value": round(n / t_dequeue, 1),
           "rows": n, "hosts": N_HOSTS, "B": B, "G": G, "cpus": cpus,
           "dequeued": dequeued,
           "dequeue_sec": round(t_dequeue, 2),
           "dequeue_rows_per_sec": round(n / t_dequeue, 1),
           "salted_guard_sec": round(t_guarded, 2),
           "update_rewrite_sec": round(t_update, 2),
           "update_mor_commit_sec": round(t_mor_commit, 2),
           "view_dequeue_sec": round(t_view_dequeue, 2),
           "update_rows_per_sec": round(n / t_update, 1)}
    print(json.dumps(out))

    bench_md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", "BASELINE.md")
    with open(bench_md, "a") as f:
        f.write(f"\n| frontier schedule ({n} rows, {N_HOSTS} hosts, hot "
                f"host 10%, B={B}, G={G}, local[{cpus}]) | dequeue "
                f"{out['dequeue_rows_per_sec']} rows/s ({t_dequeue:.1f}s; "
                f"salted hot-host guard {t_guarded:.1f}s, exact-equal "
                f"batch) | state transition: full rewrite {t_update:.1f}s "
                f"vs MOR tombstone commit {t_mor_commit:.1f}s "
                f"(read-through dequeue {t_view_dequeue:.1f}s) |\n")
    spark.stop()


if __name__ == "__main__":
    main()
