#!/usr/bin/env python
"""spark-submit entry (BASELINE.json north_star: "run via spark-submit
--py-files on multi-executor clusters"): generates a small corpus, runs
the crawl engine, and checks it against the Python oracle — proving the
package works when shipped to executors as a --py-files zip instead of
an installed library.

    zip -r /tmp/delver_spark.zip delver_spark
    spark-submit --master local[8] --py-files /tmp/delver_spark.zip \
        scripts/submit_demo.py
"""
import sys
import tempfile

import numpy as np
from pyspark.sql import SparkSession


def main():
    spark = (SparkSession.builder.appName("delver_submit_demo")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.operators.crawl import CrawlEngine
    from delver_spark.oracle.crawler import run_oracle

    corpus = tempfile.mkdtemp(prefix="submit_corpus_")
    generate_corpus(corpus, n_pages=150, n_hosts=8, seed=21,
                    max_rounds=5, global_budget=30, per_host_budget=5)
    oracle = run_oracle(corpus)
    eng = CrawlEngine(spark, corpus, tempfile.mkdtemp(prefix="submit_wd_"))
    res = eng.run()
    got = list(eng.crawl_order_df()[["seq", "url_canon"]]
               .itertuples(index=False, name=None))
    want = [(r["seq"], r["url_canon"]) for r in oracle.crawl_order]
    ok = (got == want and
          np.array_equal(oracle.bloom.bit_positions(),
                         eng.bloom.bit_positions()))
    print(f"SUBMIT_DEMO ok={ok} rounds={res['rounds']} "
          f"fetched={res['fetched']}")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
