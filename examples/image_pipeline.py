#!/usr/bin/env python
"""Runnable end-to-end image training-data pipeline demo:

  synth corpus → curate_image_caption → aspect buckets → resize
  (task-local scan, in-task shard write) → pack_shards manifest →
  WebDataset tar shards (the artifact trainers consume)

Usage: ``python examples/image_pipeline.py [n_images]`` (default 500).
Everything is written under a temp dir and deleted on exit; prints a
per-stage summary. The same chain at cluster scale: the corpus is an
Iceberg/parquet table of (image_id, bytes, w, h, fmt, caption, phash),
resize_images_direct's splits come from the table manifest, and
out_dir is the object-store output prefix.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main(n: int = 500) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from delver_spark.fixtures.codecs import encode, phash64
    from delver_spark.operators.assemble import pack_shards
    from delver_spark.operators.multimodal import (aspect_bucket_batches,
                                                   curate_image_caption,
                                                   resize_images_direct)
    from delver_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="image_pipeline_demo_")
    corpus = os.path.join(work, "corpus")
    out_dir = os.path.join(work, "resized")
    os.makedirs(corpus)
    rng = np.random.default_rng(42)
    rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                            "caption", "phash")}
    for i in range(n):
        w = 16 + int(rng.integers(0, 240))
        h = 16 + int(rng.integers(0, 240))
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fmt = "ppm" if i % 3 else "qjpg"
        rows["image_id"].append(f"img{i:07d}")
        rows["bytes"].append(encode(pix, fmt))
        rows["w"].append(w)
        rows["h"].append(h)
        rows["fmt"].append(fmt)
        rows["caption"].append(f"a synthetic {w}x{h} noise image no {i}")
        rows["phash"].append(phash64(pix))
    pq.write_table(pa.table({
        "image_id": pa.array(rows["image_id"]),
        "bytes": pa.array(rows["bytes"], pa.binary()),
        "w": pa.array(rows["w"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "fmt": pa.array(rows["fmt"]),
        "caption": pa.array(rows["caption"]),
        "phash": pa.array(rows["phash"], pa.int64()),
    }), os.path.join(corpus, "part-0000.parquet"), row_group_size=128)

    spark = get_spark("image_pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        df = spark.read.parquet(corpus)
        buckets = [(48, 144), (64, 96), (80, 80), (96, 64), (144, 48)]

        # 1. curation gates over metadata only (payload never shuffles)
        curated = curate_image_caption(
            df.select("image_id", "w", "h", "caption", "phash"),
            min_side=24)
        print("drop reasons:",
              {r["drop_reason"]: r["n"] for r in
               curated.groupBy("drop_reason").agg(F.count("*").alias("n"))
               .collect()})
        kept = curated.filter("keep")
        kept_ids = [r["image_id"] for r in kept.select("image_id").collect()]

        # 2. batch dealing on metadata (bucket_id/batch_idx/slot)
        batches = aspect_bucket_batches(
            kept.withColumn("seq", F.expr(
                "CAST(substring(image_id, 4) AS BIGINT)")),
            buckets=buckets, batch_size=8, order_col="seq")
        print("batches per bucket:",
              {r["bucket_id"]: r["n"] for r in
               batches.groupBy("bucket_id")
               .agg(F.countDistinct("batch_idx").alias("n"))
               .orderBy("bucket_id").collect()})

        # 3. resize: tasks read their own row-group splits and write
        # their own output shards; only the manifest comes back
        manifest = resize_images_direct(
            spark, corpus, buckets=buckets, kept_ids=kept_ids,
            out_dir=out_dir,
            carry_cols=["caption"]).localCheckpoint(eager=True)
        print("resized:", manifest.count(), "images into",
              manifest.select("shard_path").distinct().count(),
              "payload shards under", out_dir)

        # 4. pack the resized stream into ~64 KB training shards
        packed = pack_shards(
            manifest.selectExpr(
                "image_id", "CAST(substring(image_id, 4) AS BIGINT) AS s",
                "nbytes"),
            "nbytes", "s", 1 << 16)
        print("pack shards:",
              packed.agg((F.max("shard_id") + 1).alias("n"),
                         F.sum("nbytes").alias("bytes")).collect()[0]
              .asDict())

        # 5. the actual training artifact: WebDataset tar shards of the
        # curated resized pairs ({id}.{fmt} + {id}.txt members) — tasks
        # write tar fragments from their own row-group splits; payload
        # bytes never shuffle
        from delver_spark.operators.webdataset import export_webdataset
        wds_dir = os.path.join(work, "wds")
        wrow = (export_webdataset(spark, out_dir, wds_dir, 1 << 20)
                .agg(F.count("*").alias("tars"),
                     F.sum("n_items").alias("pairs"),
                     F.sum("tar_bytes").alias("bytes"))
                .collect()[0].asDict())
        print("webdataset:", wrow, "under", wds_dir)
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
