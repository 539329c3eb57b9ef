#!/usr/bin/env python
"""Feature-op scaling bench (VERDICT r4 'what's wrong' #2 done-check):
image_features / audio_features / video_frame_sample after the r5
migration to mapInArrow + zero-copy ``_binary_views``. The old
mapInPandas plans paid a per-row ``bytes(blob)`` PyBytes copy — the
pattern this repo measured ANTI-scaling with python worker count. This
bench reports rows/s at two core counts so the migration's scaling is
a recorded fact, not an assumption.

These ops still ship payload bytes JVM→python over the Arrow socket
(unlike resize_images_direct's task-local scans), so their ceiling is
the socket, bounded by batch BYTES — the session-level
maxRecordsPerBatch=256 scope applies. The corpus here is ~6 KB rows
(96px images / 8 KB audio / 3-frame video), well under the humongous-
alloc regime; at ~200 KB rows use the direct-scan design instead.

Env: SPARK_GRAFT_FEAT_ROWS (default 30000), SPARK_GRAFT_FEAT_LEVELS
(default "2,8"). One JSON line; appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))


def ensure_corpus(n: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delver_spark.fixtures.codecs import encode

    d = os.path.join(HERE, "corpus", f"featbench_n{n}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(77)
    n_shards = max(8, n // 4096)
    per = (n + n_shards - 1) // n_shards
    idx = 0
    for s in range(n_shards):
        m = min(per, n - idx)
        img, aud, vid = [], [], []
        for j in range(m):
            w = 32 + int(rng.integers(0, 64))
            h = 32 + int(rng.integers(0, 64))
            img.append(encode(rng.integers(0, 256, (h, w, 3),
                                           dtype=np.uint8), "ppm"))
            samples = rng.integers(-2000, 2000, 4000).astype("<i2")
            aud.append((16000).to_bytes(4, "little") + samples.tobytes())
            fw, fh, nf = 16, 12, 3
            frames = rng.integers(0, 256, nf * fw * fh * 3,
                                  dtype=np.uint8).tobytes()
            vid.append(fw.to_bytes(4, "little") + fh.to_bytes(4, "little")
                       + nf.to_bytes(4, "little") + frames)
        pq.write_table(pa.table({
            "rid": pa.array([f"r{idx + j:08d}" for j in range(m)]),
            "img": pa.array(img, pa.binary()),
            "aud": pa.array(aud, pa.binary()),
            "vid": pa.array(vid, pa.binary()),
        }), os.path.join(d, f"part-{s:04d}.parquet"), row_group_size=1024)
        idx += m
    open(os.path.join(d, "_DONE"), "w").write(str(idx))
    return d


def run_level(corpus: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from delver_spark.operators.multimodal import (audio_features,
                                                   image_features,
                                                   scoped_arrow_batch,
                                                   video_frame_sample)
    from delver_spark.session import get_spark

    spark = get_spark(f"featbench_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = spark.read.parquet(corpus).localCheckpoint(eager=True)
    n = base.count()
    out = {"cpus": cpus, "n": n}
    with scoped_arrow_batch(spark, 256):
        for name, df in (
            ("image", image_features(base.select(
                F.col("rid").alias("image_id"),
                F.col("img").alias("bytes"), F.lit("ppm").alias("fmt")))),
            ("audio", audio_features(base.select(
                F.col("rid").alias("audio_id"),
                F.col("aud").alias("bytes"),
                F.lit("fake-pcm16").alias("fmt")))),
            ("video", video_frame_sample(base.select(
                F.col("rid").alias("video_id"),
                F.col("vid").alias("bytes"),
                F.lit("fake-rawrgb").alias("fmt")), every_n=2)),
        ):
            best = float("inf")
            for _ in range(2):          # best-of-2 (box phase noise)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[f"{name}_s"] = round(best, 2)
            out[f"{name}_rows_per_s"] = round(n / best, 1)
    spark.stop()
    return out


def main():
    n = int(os.environ.get("SPARK_GRAFT_FEAT_ROWS", 30000))
    levels = [int(x) for x in
              os.environ.get("SPARK_GRAFT_FEAT_LEVELS", "2,8").split(",")]
    corpus = ensure_corpus(n)
    res = [run_level(corpus, c) for c in levels]
    lo, hi = res[0], res[-1]
    ratio = hi["cpus"] / lo["cpus"]
    effs = {k: round((hi[f"{k}_rows_per_s"] / lo[f"{k}_rows_per_s"])
                     / ratio, 3)
            for k in ("image", "audio", "video")}
    out = {"metric": "feature_ops", "rows": n, "levels": res,
           "scaling_eff": effs}
    print(json.dumps(out))
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| feature ops ({n} rows, mapInArrow r5) | "
            f"local[{lo['cpus']}] img {lo['image_rows_per_s']}/s aud "
            f"{lo['audio_rows_per_s']}/s vid {lo['video_rows_per_s']}/s | "
            f"local[{hi['cpus']}] img {hi['image_rows_per_s']}/s aud "
            f"{hi['audio_rows_per_s']}/s vid {hi['video_rows_per_s']}/s | "
            f"N→{int(ratio)}N eff img {effs['image']} aud {effs['audio']} "
            f"vid {effs['video']} |\n")


if __name__ == "__main__":
    main()
