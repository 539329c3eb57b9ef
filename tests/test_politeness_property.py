"""Property check: the distributed dequeue (per-host rank + global top-G)
equals the oracle's sequential greedy on random frontiers — the O2
equivalence the engine's correctness rests on."""

import random

from delver_spark.operators.frontier import FRONTIER_SCHEMA, dequeue


def _greedy(rows, B, G):
    """Sequential greedy (oracle/crawler.py:_dequeue semantics)."""
    taken, per_host = [], {}
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        host = r[4]
        if len(taken) < G and per_host.get(host, 0) < B:
            taken.append(r[2])
            per_host[host] = per_host.get(host, 0) + 1
    return taken


def test_dequeue_equals_sequential_greedy(spark):
    rng = random.Random(99)
    for trial in range(12):
        n = rng.randrange(5, 120)
        rows = []
        for i in range(n):
            rows.append((rng.randrange(3),      # priority
                         rng.randrange(4),      # enqueue_round
                         i,                     # enqueue_seq (unique)
                         f"http://h{i}.test/",  # url
                         f"h{rng.randrange(6)}",  # host
                         0, None))
        B = rng.randrange(1, 5)
        G = rng.randrange(1, n + 5)
        df = spark.createDataFrame(rows, FRONTIER_SCHEMA)
        got = [r["enqueue_seq"] for r in dequeue(df, B, G).orderBy("pos").collect()]
        want = _greedy(rows, B, G)
        assert got == want, f"trial {trial}: B={B} G={G}"
