#!/usr/bin/env python
"""Seen-set A/B on the real crawl round: bloom vs cuckoo mode on the
same pre-filled 400k-page drain (bench_scaling.one_round, big-G path),
best-of-2 each, one core count (SPARK_GRAFT_CPUS, default 8).

What this measures: the marginal cost of swapping the rolling bloom's
treeAggregate bitset OR-merge for the cuckoo's derived-pair collect +
canonical driver insert — everything else in the round (dequeue,
payload scan, extract, admission) is identical code. The cuckoo's
round-commit is one mapInArrow hash pass (same zero-copy hashing the
bloom pass uses) whose output is 24 B/url rows instead of a fixed-size
bitmap, plus a driver-side sorted-unique bulk insert (~4 µs/url,
bench_cuckoo.py) — so the expected delta is seconds-level at 400k urls
and amortizes at bigger G exactly like the bloom's bitset transfer.

Prints one JSON line; appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_scaling  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    reps = int(os.environ.get("SPARK_GRAFT_REPS", 2))
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "corpus")
    corpus = bench_scaling.ensure_corpus(root)

    out = {}
    for seen in ("bloom", "cuckoo"):
        os.environ["SPARK_GRAFT_SCALE_SEEN"] = seen
        best, fetched = None, 0
        for _ in range(reps):
            dt, n = bench_scaling.one_round(cpus, corpus)
            best = dt if best is None else min(best, dt)
            fetched = n
        out[seen] = {"sec": round(best, 2),
                     "urls_per_s": round(fetched / best, 1),
                     "fetched": fetched}

    ratio = out["cuckoo"]["sec"] / out["bloom"]["sec"]
    line = {"metric": "crawl_seen_ab", "cpus": cpus,
            "n_pages": bench_scaling.N_PAGES, "reps": reps,
            "bloom": out["bloom"], "cuckoo": out["cuckoo"],
            "cuckoo_over_bloom": round(ratio, 3)}
    print(json.dumps(line))

    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| crawl seen-set A/B ({bench_scaling.N_PAGES} pages, "
            f"local[{cpus}], best-of-{reps}, {stamp}) | "
            f"bloom {out['bloom']['sec']}s "
            f"({out['bloom']['urls_per_s']} urls/s) | "
            f"cuckoo {out['cuckoo']['sec']}s "
            f"({out['cuckoo']['urls_per_s']} urls/s) | "
            f"cuckoo/bloom {ratio:.3f} |\n")


if __name__ == "__main__":
    main()
