#!/usr/bin/env python
"""Recrawl demo: the cuckoo seen-set's per-URL deletion driving the two
recrawl policies a production image crawl actually runs — neither is
expressible with the rolling bloom, whose only forget is dropping a
whole generation:

  1. RETRY AFTER AN OUTAGE. dfs marks a page visited BEFORE the fetch
     outcome (reference dfs_basic semantics), so fetch failures are in
     the seen-set and would never retry. Here ~10% of the payload table
     vanishes before the first crawl (the "site down" window), the
     crawl records those fetches as failures, the table is restored,
     the engine RESUMES FROM ITS CHECKPOINT (same frontier + seen-set),
     and `readmit_df` re-enqueues exactly the failed urls — the next
     rounds refetch them, successfully this time.
  2. FRESHNESS RECRAWL. Pages fetched in the oldest rounds are
     readmitted wholesale — the "re-visit the front page every day"
     policy — without touching the rest of the seen-set.

Both feed :meth:`CrawlEngine.readmit_df` with a DataFrame of urls (the
10^10-frontier form: urls canonicalize+hash on the executors, seqs come
from the sharded global rank, and only 24-byte derived rows reach the
driver-resident filter). The victims come from the crawl-order
artifact — at cluster scale that artifact is the engine's distributed
parquet write and the selection is a column filter, exactly as below.

Usage: ``python examples/recrawl.py [n_pages]`` (default 1500).
Temp-dir hygiene and per-stage timings match the other examples.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main(n_pages: int = 1500) -> None:
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.operators.crawl import CrawlEngine
    from delver_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="recrawl_demo_")
    corpus = os.path.join(work, "corpus")
    wd = os.path.join(work, "crawl")
    # single-host corpus: the crawl truly EXHAUSTS (multi-host corpora
    # ping-pong forever through the cross-domain stash/refill quirk), so
    # every post-readmit fetch is attributable to the readmit
    generate_corpus(corpus, n_pages=n_pages, n_hosts=1, seed=31,
                    n_seeds=6, max_depth=5, per_host_budget=256,
                    global_budget=n_pages, max_rounds=40,
                    golden_pixel_cap=0, sizes=(48, 64))

    # -- simulate the outage: hide ~10% of the payload table (never the
    # seeds — a dead seed kills the whole crawl, a dead interior page is
    # the realistic partial outage) ---------------------------------------
    pages_dir = os.path.join(corpus, "pages.parquet")
    backup = os.path.join(work, "pages_full.parquet")
    shutil.copytree(pages_dir, backup)
    seeds = set(pq.read_table(os.path.join(corpus, "seeds.parquet"))
                .column("url").to_pylist())
    full = ds.dataset(pages_dir).to_table()
    urls = full.column("url_canon").to_pandas()
    mask = ((urls.str.slice(-1) == "3")
            & ~urls.isin(seeds)).to_numpy()  # deterministic ~1-in-10
    shutil.rmtree(pages_dir)
    os.makedirs(pages_dir)
    pq.write_table(full.filter(~mask),
                   os.path.join(pages_dir, "part-0.parquet"),
                   row_group_size=2048)

    spark = get_spark("recrawl_demo")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        t0 = time.time()
        eng = CrawlEngine(spark, corpus, wd, seen_filter="cuckoo")
        stats = eng.run()
        order = eng.crawl_order_df()
        n0 = len(order)
        failed = sorted(order.loc[~order["success"], "url_canon"])
        t1 = time.time()
        print(f"[1 crawl    {t1 - t0:7.2f}s] rounds={stats['rounds']} "
              f"fetched={n0} (ok={int(order['success'].sum())}, "
              f"failed={len(failed)} — the outage), "
              f"seen-set n={eng.cuckoo.n}")

        # -- site restored: resume from checkpoint, retry the failures ---
        shutil.rmtree(pages_dir)
        shutil.copytree(backup, pages_dir)
        eng = CrawlEngine.resume(spark, corpus, wd)
        assert eng.seen_filter == "cuckoo"
        n_re = eng.readmit_df(
            spark.createDataFrame([(u,) for u in failed], "url string"))
        eng.run(max_rounds=eng.round + 8)
        order = eng.crawl_order_df()
        retried = order.iloc[n0:]
        ok_now = int(retried["success"].sum())
        got = set(retried["url_canon"])
        # the retried pages' OUTLINKS were never seen (a failed fetch
        # yields none), so the retry also unlocks pages reachable only
        # through the restored ones — report both
        t2 = time.time()
        print(f"[2 retry    {t2 - t1:7.2f}s] restored table, resumed "
              f"from checkpoint, readmitted {n_re} failed urls → "
              f"{len(retried)} refetched, {ok_now} now succeed "
              f"(all failures retried: {set(failed) <= got}; "
              f"+{len(got - set(failed))} newly unlocked)")

        # -- freshness: recrawl everything from the two oldest rounds ----
        n1 = len(order)
        stale = (order.loc[(order["round"] <= 1) & order["success"],
                           "url_canon"].drop_duplicates())
        n_re2 = eng.readmit_df(
            spark.createDataFrame([(u,) for u in stale], "url string"))
        eng.run(max_rounds=eng.round + 8)
        order = eng.crawl_order_df()
        refreshed = order.iloc[n1:]
        t3 = time.time()
        # a refreshed page's outlink can re-admit a url whose filter
        # entry was just deleted (round-snapshot probe) — the second
        # fetch of the same url within the refresh is correct crawl
        # semantics, so count fetches and unique urls separately
        print(f"[3 refresh  {t3 - t2:7.2f}s] readmitted {n_re2} "
              f"round-0/1 urls → {len(refreshed)} fetches over "
              f"{refreshed['url_canon'].nunique()} urls "
              f"(exactly the stale set: "
              f"{set(refreshed['url_canon']) == set(stale)}); "
              f"seen-set n={eng.cuckoo.n}")
        print(f"[total      {t3 - t0:7.2f}s] {len(order)} fetches over "
              f"{eng.round} rounds, one seen-set, zero full rebuilds")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500)
