#!/usr/bin/env python
"""Connected-components bench (VERDICT r2 #4 done-criterion): ~10^6
edges of dense duplicate clusters PLUS one adversarial long chain.
Min-label propagation pays one shuffle round per chain hop; the
large-star/small-star variant closes the same graph in O(log²) rounds.
Reports rounds + wall time for both and appends a row to
BENCH/BASELINE.md.

Env: SPARK_GRAFT_CC_EDGES (default 1000000), SPARK_GRAFT_CC_CHAIN
(default 64), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import pandas as pd

    from delver_spark.operators import dedup as D
    from delver_spark.session import get_spark

    n_edges = int(os.environ.get("SPARK_GRAFT_CC_EDGES", 1_000_000))
    chain = int(os.environ.get("SPARK_GRAFT_CC_CHAIN", 64))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("delver_bench_cc", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rng = np.random.default_rng(23)
    # dense duplicate clusters: 10-node clusters, 10 random intra edges
    n_clusters = (n_edges - chain) // 10
    cl = rng.integers(0, 10, size=(n_clusters, 10, 2))
    base = (np.arange(n_clusters, dtype=np.int64) * 10)[:, None, None]
    intra = (base + cl).reshape(-1, 2)
    # one adversarial chain at high ids (diameter = chain hops)
    c0 = n_clusters * 10 + 1000
    chain_edges = np.stack([np.arange(c0, c0 + chain),
                            np.arange(c0 + 1, c0 + chain + 1)], axis=1)
    edges = np.concatenate([intra, chain_edges]).astype(np.int64)
    pairs = spark.createDataFrame(pd.DataFrame(
        {"doc_a": edges[:, 0], "doc_b": edges[:, 1]})) \
        .repartition(cpus).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    star = D.connected_components_star(pairs)
    n_star = star.count()
    star_root = star.agg({"component": "min"}).collect()[0][0]
    t_star = time.perf_counter() - t0

    t0 = time.perf_counter()
    lab = D.connected_components(pairs, max_iter=chain + 10)
    n_lab = lab.count()
    t_label = time.perf_counter() - t0

    # real assignment equality, not just node counts (ADVICE r3: both
    # always equal the distinct-node count, so a count compare is
    # vacuous): symmetric difference of the (doc_id, component) sets —
    # outside the timed regions, so the bench numbers are unaffected
    n_diff = (star.exceptAll(lab).count() + lab.exceptAll(star).count())
    same = n_star == n_lab and n_diff == 0
    out = {"metric": "cc_star_vs_minlabel", "edges": int(len(edges)),
           "chain": chain,
           "star_sec": round(t_star, 2), "minlabel_sec": round(t_label, 2),
           "nodes": n_star, "outputs_equal": bool(same),
           "assignment_diff_rows": int(n_diff),
           "min_component": int(star_root), "cpus": cpus}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| connected components ({len(edges)} edges incl. "
            f"{chain}-hop chain, local[{cpus}]) | large-star/small-star "
            f"{out['star_sec']}s | min-label {out['minlabel_sec']}s "
            f"(one shuffle round per hop) | {n_star} nodes |\n")


if __name__ == "__main__":
    main()
