#!/usr/bin/env python
"""Image-path throughput bench: the curate → aspect-bucket → resize →
pack chain over synthetic (image_id, bytes, w, h, fmt, caption, phash)
rows — the BASELINE input_hint table shape. Measures images/s for the
resize stage (the decode/encode-bound hot path) and end-to-end chain
time at two parallelism levels, reporting the scaling efficiency the
north rule asks for on the IMAGE payload path specifically.

Corpus: sharded parquet (row_group_size=512 ≈ 60 MB splits — a single
default row group is unsplittable, and coarse uneven groups cap task
packing; see ensure_corpus) written once under corpus/ and reused;
sizes drawn deterministically from the SDXL ratio range so every
bucket is populated.

Env: SPARK_GRAFT_MM_IMAGES (default 20000), SPARK_GRAFT_MM_LEVELS
(default "4,16" — comma-separated core counts), SPARK_GRAFT_MM_SIDE
(default 96: max image side in px; keeps the corpus ~1-2 GB at the
default count).

One JSON line to stdout; appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))


def ensure_corpus(n: int, max_side: int, rg_size: int = 512) -> str:
    """Deterministic image+caption parquet shards under corpus/.

    ``rg_size``: parquet row-group size = the direct-scan split grain.
    The first cut (2048) gave each file row groups of (2048, 2048, 349)
    — 27 skewed splits that pack onto 8 cores at ≤0.75 occupancy, which
    showed up as a fake ~0.65 scaling ceiling. 512-row groups (~60 MB)
    give ~80 even splits."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delver_spark.fixtures.codecs import encode, phash64

    d = os.path.join(HERE, "corpus", f"mmbench_n{n}_s{max_side}_rg{rg_size}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(1234)
    n_shards = max(8, n // 4096)
    per = (n + n_shards - 1) // n_shards
    idx = 0
    for s in range(n_shards):
        rows = {"image_id": [], "bytes": [], "w": [], "h": [],
                "fmt": [], "caption": [], "phash": []}
        for _ in range(min(per, n - idx)):
            # sizes spanning the SDXL ratio ladder, deterministic
            w = 16 + int(rng.integers(0, max_side - 16))
            h = 16 + int(rng.integers(0, max_side - 16))
            pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            fmt = "ppm" if idx % 3 else "qjpg"
            rows["image_id"].append(f"img{idx:08d}")
            rows["bytes"].append(encode(pix, fmt))
            rows["w"].append(w)
            rows["h"].append(h)
            rows["fmt"].append(fmt)
            rows["caption"].append(f"synthetic caption number {idx} with "
                                   f"{w}x{h} pixels of noise")
            rows["phash"].append(phash64(pix))  # already signed int64
            idx += 1
        t = pa.table({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "caption": pa.array(rows["caption"], pa.string()),
            "phash": pa.array(rows["phash"], pa.int64()),
        })
        pq.write_table(t, os.path.join(d, f"part-{s:04d}.parquet"),
                       row_group_size=rg_size)
    open(os.path.join(d, "_DONE"), "w").write(str(idx))
    return d


def run_level(corpus: str, cpus: int, buckets) -> dict:
    """One measured pass at local[cpus]; returns stage timings."""
    from pyspark.sql import functions as F

    from delver_spark.operators.assemble import pack_shards
    from delver_spark.operators.multimodal import (aspect_bucket_batches,
                                                   aspect_bucket_dims,
                                                   curate_image_caption,
                                                   resize_images_direct,
                                                   resize_to_bucket,
                                                   scoped_arrow_batch)
    from delver_spark.session import get_spark

    spark = get_spark(f"mmbench_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    df = spark.read.parquet(corpus)
    n = df.count()

    # stage 1: curation gates over metadata only (never ship bytes).
    # localCheckpoint the kept-id set so the curation shuffle runs ONCE
    # — stages 2 and 3 both consume `kept`, and without the checkpoint
    # each silently re-ran the window, misattributing curation cost to
    # their timings (code-review r4-s5)
    meta = df.select("image_id", "w", "h", "caption", "phash")
    t0 = time.perf_counter()
    kept = (curate_image_caption(meta, min_side=24)
            .filter("keep").select("image_id")
            .localCheckpoint(eager=True))
    kept_ids = [r["image_id"] for r in kept.collect()]
    n_kept = len(kept_ids)
    t_curate = time.perf_counter() - t0

    # stage 2: batch dealing on METADATA only (the rank shuffles)
    seq = F.expr("CAST(substring(image_id, 4) AS BIGINT)")
    t0 = time.perf_counter()
    batches = aspect_bucket_batches(
        meta.join(F.broadcast(kept), "image_id")
            .withColumn("img_seq", seq).drop("caption"),
        buckets=buckets, batch_size=32, order_col="img_seq",
        scale_safe=True, chunk=8192)
    batches.write.format("noop").mode("overwrite").save()
    t_batch = time.perf_counter() - t0

    # stage 3: resize. Default = task-local row-group scan
    # (resize_images_direct: payload bytes never cross the JVM↔python
    # socket — the socket plan measured 10x below the single-core python
    # compute floor AND anti-scaled with cores, see BENCH notes).
    # SPARK_GRAFT_MM_SOCKET=1 benches the socket plan for comparison.
    out_dir = tempfile.mkdtemp(prefix="mmbench_resized_")
    t0 = time.perf_counter()
    if os.environ.get("SPARK_GRAFT_MM_SOCKET") == "1":
        # socket comparison plan: payloads cross JVM→python and back
        resized = resize_to_bucket(
            aspect_bucket_dims(df.join(F.broadcast(kept), "image_id"),
                               buckets=buckets))
        with scoped_arrow_batch(spark, 256):
            sizes = (resized.select(
                F.col("image_id"), seq.alias("s"),
                F.octet_length("bytes").cast("long").alias("nb"))
                .localCheckpoint(eager=True))
    elif os.environ.get("SPARK_GRAFT_MM_VERDICT") == "1":
        # corpus-scale kept-set plan (r5): the curation verdict is a
        # kept-partitioned range-sorted parquet table; resize tasks
        # probe their own row group's id interval — no driver broadcast
        # of the id list (its write time is charged to this stage)
        from delver_spark.operators.multimodal import write_curation_verdict
        vd = tempfile.mkdtemp(prefix="mmbench_verdict_")
        write_curation_verdict(
            curate_image_caption(meta, min_side=24)
            .select("image_id", F.col("drop_reason").isNull().alias("kept")),
            vd)
        manifest = resize_images_direct(spark, corpus, buckets=buckets,
                                        verdict_dir=vd,
                                        out_dir=out_dir)
        sizes = (manifest.select(
            F.col("image_id"), seq.alias("s"),
            F.col("nbytes").alias("nb"))
            .localCheckpoint(eager=True))
        shutil.rmtree(vd, ignore_errors=True)
    else:
        # production plan: tasks read their own row-group splits AND
        # write their own output shards; only the manifest flows back
        manifest = resize_images_direct(spark, corpus, buckets=buckets,
                                        kept_ids=kept_ids,
                                        out_dir=out_dir)
        sizes = (manifest.select(
            F.col("image_id"), seq.alias("s"),
            F.col("nbytes").alias("nb"))
            .localCheckpoint(eager=True))
    t_resize = time.perf_counter() - t0
    n_resized = n_kept  # 1:1 narrow map over the kept rows

    # stage 5 (skipped in socket mode, which writes no payload shards):
    # WebDataset tar export of the resized table — fragment writes from
    # task-local splits + per-shard concat finalize; the measured cost
    # is ~2 sequential passes over the resized bytes, zero shuffle
    t_wds = wds_mb = 0.0
    if os.environ.get("SPARK_GRAFT_MM_SOCKET") != "1":
        from delver_spark.operators.webdataset import export_webdataset
        wds_dir = tempfile.mkdtemp(prefix="mmbench_wds_")
        t0 = time.perf_counter()
        wrow = (export_webdataset(spark, out_dir, wds_dir, 1 << 24,
                                  caption_col=None)
                .agg(F.sum("tar_bytes").alias("b")).collect()[0])
        t_wds = time.perf_counter() - t0
        wds_mb = (wrow["b"] or 0) / 1e6
        shutil.rmtree(wds_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)

    # stage 4: pack the (metadata-only) resized stream into shards
    t0 = time.perf_counter()
    packed = pack_shards(sizes, "nb", "s", 1 << 22,
                         scale_safe=True, chunk=8192)
    n_shards = packed.agg(F.max("shard_id")).collect()[0][0] + 1
    t_pack = time.perf_counter() - t0

    spark.stop()
    return {"cpus": cpus, "n": n, "kept": n_kept,
            "curate_s": round(t_curate, 2),
            "batch_s": round(t_batch, 2),
            "resize_s": round(t_resize, 2),
            "resize_imgs_per_s": round(n_resized / t_resize, 1),
            "pack_s": round(t_pack, 2), "shards": int(n_shards),
            "wds_s": round(t_wds, 2),
            "wds_mb_per_s": round(wds_mb / t_wds, 1) if t_wds else 0.0,
            "total_s": round(t_curate + t_batch + t_resize + t_pack
                             + t_wds, 2)}


def main():
    n = int(os.environ.get("SPARK_GRAFT_MM_IMAGES", 20000))
    side = int(os.environ.get("SPARK_GRAFT_MM_SIDE", 96))
    levels = [int(x) for x in
              os.environ.get("SPARK_GRAFT_MM_LEVELS", "4,16").split(",")]
    # small buckets matched to the corpus size range
    buckets = [(32, 96), (48, 80), (64, 64), (80, 48), (96, 32)]
    corpus = ensure_corpus(n, side)

    res = [run_level(corpus, c, buckets) for c in levels]
    lo, hi = res[0], res[-1]
    ratio = hi["cpus"] / lo["cpus"]
    eff = (hi["resize_imgs_per_s"] / lo["resize_imgs_per_s"]) / ratio
    mode = ("socket" if os.environ.get("SPARK_GRAFT_MM_SOCKET") == "1"
            else "verdict-table"
            if os.environ.get("SPARK_GRAFT_MM_VERDICT") == "1"
            else "kept-ids")
    out = {"metric": "mm_pipeline", "images": n, "mode": mode,
           "levels": res, "resize_scaling_eff": round(eff, 3)}
    print(json.dumps(out))
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| image pipeline ({n} imgs ≤{side}px, {mode}) | "
            f"local[{lo['cpus']}] resize {lo['resize_imgs_per_s']} img/s, "
            f"chain {lo['total_s']}s | local[{hi['cpus']}] resize "
            f"{hi['resize_imgs_per_s']} img/s, chain {hi['total_s']}s | "
            f"resize N→{int(ratio)}N efficiency {out['resize_scaling_eff']}"
            f"; wds export {lo['wds_mb_per_s']}→{hi['wds_mb_per_s']} MB/s"
            f" (chain totals include the wds stage since r5-s9) |\n")


if __name__ == "__main__":
    main()
