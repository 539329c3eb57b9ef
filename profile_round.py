#!/usr/bin/env python
"""Per-stage profile of the big scaling round at two parallelism levels."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8388608")

import bench_scaling as bs


def profiled_round(cpus: int, corpus: str):
    from pyspark.sql import SparkSession

    from delver_spark.operators.crawl import CrawlEngine
    from delver_spark.operators.frontier import FRONTIER_SCHEMA
    from delver_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(f"delver_prof_{cpus}", cpus=cpus,
                      shuffle_partitions=cpus * 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(100).mapInPandas(lambda it: it, "id long").count()

    wd = tempfile.mkdtemp(prefix=f"delver_prof_{cpus}_")
    try:
        eng = CrawlEngine(spark, corpus, wd,
                          collect_documents=False, collect_order=False)
        pages = spark.read.parquet(os.path.join(corpus, "pages.parquet")) \
            .select("url_canon", "host").orderBy("url_canon")
        rows = spark.createDataFrame(
            pages.rdd.zipWithIndex().map(
                lambda t: (0, 0, t[1], t[0][0], t[0][1], 0, None)),
            FRONTIER_SCHEMA)
        eng.frontier = rows.repartition(cpus * 4, "host") \
            .localCheckpoint(eager=True)
        eng.frontier_count = eng.frontier.count()
        eng._base_count = eng.frontier_count
        eng.seq = eng.frontier_count

        # SPARK_GRAFT_PROF_ROUNDS > 1 profiles the SUSTAINED drain (the
        # bench_scaling multi-round regime): the frontier is split into
        # that many G-sized rounds so the per-round fixed cost shows up
        # n_rounds times in the stage totals
        n_rounds = int(os.environ.get("SPARK_GRAFT_PROF_ROUNDS", 1))
        eng.G = (eng.frontier_count + n_rounds - 1) // n_rounds
        timings = {}
        t0 = time.perf_counter()
        for _ in range(n_rounds):
            assert eng.run_round(timings)
        dt = time.perf_counter() - t0
        return dt, timings
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


def main():
    corpus = bs.ensure_corpus(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "corpus"))
    import os as _os
    levels = tuple(int(x) for x in _os.environ.get(
        "SPARK_GRAFT_PROF_LEVELS", "4,16").split(","))
    for cpus in levels:
        dt, tm = profiled_round(cpus, corpus)
        print(json.dumps({"cpus": cpus, "total": round(dt, 2),
                          "stages": {k: round(v, 2) for k, v in
                                     sorted(tm.items(), key=lambda kv: -kv[1])}}))


if __name__ == "__main__":
    main()
