#!/usr/bin/env python
"""Language-quota skew bench (VERDICT r3 #3 done-criterion): at ~10^7
docs with an 80%-dominant language, the plain per-language window puts
0.8n rows through ONE task; the salted two-phase pre-cut
(textstats.language_quota(salt_buckets=S)) splits that into S parallel
tasks and re-ranks only <= S*per_lang survivors. Times both on the same
synthetic input, verifies identical output, prints one JSON line and
appends a row to BENCH/BASELINE.md.

Env: SPARK_GRAFT_QUOTA_DOCS (default 10000000), SPARK_GRAFT_QUOTA_SALT
(default 32), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from pyspark.sql import functions as F

    from delver_spark.operators.textstats import language_quota
    from delver_spark.session import get_spark

    n_docs = int(os.environ.get("SPARK_GRAFT_QUOTA_DOCS", 10_000_000))
    salt = int(os.environ.get("SPARK_GRAFT_QUOTA_SALT", 32))
    per_lang = 10_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("delver_bench_quota", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # 80% of rows land in 'en'; quality is a deterministic hash so ranks
    # are unique-ish and ties exercise the id tie-break
    docs = (spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 5 < 4, "en")
        .otherwise(F.concat(F.lit("l"),
                            (F.col("id") % 19).cast("string"))).alias("lang"),
        F.pmod(F.hash(F.col("id")), F.lit(1_000_000)).alias("n_chars"))
        .repartition(cpus * 4).localCheckpoint(eager=True))

    t0 = time.perf_counter()
    plain = language_quota(docs, per_lang)
    n_plain = plain.count()
    t_plain = time.perf_counter() - t0

    t0 = time.perf_counter()
    salted = language_quota(docs, per_lang, salt_buckets=salt)
    n_salted = salted.count()
    t_salted = time.perf_counter() - t0

    # full-assignment equality, outside the timed regions
    n_diff = plain.exceptAll(salted).count() + salted.exceptAll(plain).count()
    out = {"metric": "language_quota_skew", "n_docs": n_docs,
           "per_lang": per_lang, "salt_buckets": salt,
           "plain_sec": round(t_plain, 2), "salted_sec": round(t_salted, 2),
           "rows": n_plain, "outputs_equal": bool(n_plain == n_salted
                                                  and n_diff == 0),
           "cpus": cpus}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| language quota ({n_docs} docs, 80% one language, "
            f"top-{per_lang}/lang, local[{cpus}]) | plain window "
            f"{out['plain_sec']}s (one straggler task ranks 0.8n rows) | "
            f"salted pre-cut x{salt} {out['salted_sec']}s | "
            f"outputs equal: {out['outputs_equal']} |\n")


if __name__ == "__main__":
    main()
