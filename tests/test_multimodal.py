"""Multimodal plumbing: real image path, stubbed AV codecs with real
Spark-side schemas/batch shapes (task spec: stub decode, test plumbing)."""

import numpy as np
import pytest

from delver_spark.fixtures.codecs import encode
from delver_spark.operators.multimodal import (
    audio_features,
    image_features,
    video_frame_sample,
)


def test_image_features_and_resize(spark):
    rng = np.random.default_rng(5)
    rows = []
    pix0 = None
    for i in range(6):
        pix = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
        if i == 0:
            pix0 = pix
        rows.append((f"img-{i}", encode(pix, "ppm"), "ppm"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {r["image_id"]: r for r in image_features(df, thumb=(4, 4)).collect()}
    assert len(out) == 6
    r0 = out["img-0"]
    assert (r0["w"], r0["h"]) == (16, 24)
    assert abs(r0["mean_r"] - pix0[:, :, 0].mean()) < 1e-9
    thumb = np.frombuffer(r0["thumb"], np.uint8).reshape(4, 4, 3)
    assert thumb.shape == (4, 4, 3)


def test_audio_stub_plumbing(spark):
    samples = (np.sin(np.linspace(0, 20, 800)) * 10000).astype("<i2")
    blob = (16000).to_bytes(4, "little") + samples.tobytes()
    df = spark.createDataFrame([("a0", blob, "fake-pcm16")],
                               "audio_id string, bytes binary, fmt string")
    r = audio_features(df).collect()[0]
    assert r["n_samples"] == 800 and r["sample_rate"] == 16000
    assert r["rms_milli"] > 0


def test_audio_real_format_raises(spark):
    df = spark.createDataFrame([("a0", b"RIFF....", "wav")],
                               "audio_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="NotImplementedError|soundfile"):
        audio_features(df).collect()


def test_video_frame_sample(spark):
    w, h, n = 4, 3, 6
    frames = np.arange(n * w * h * 3, dtype=np.uint8).tobytes()
    blob = (w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + n.to_bytes(4, "little") + frames)
    df = spark.createDataFrame([("v0", blob, "fake-rawrgb")],
                               "video_id string, bytes binary, fmt string")
    out = video_frame_sample(df, every_n=2).collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [0, 2, 4]
    assert all(len(r["frame"]) == w * h * 3 for r in out)


def test_curate_image_caption(spark):
    from delver_spark.operators.multimodal import curate_image_caption

    cap = "a nice red car parked"
    rows = [
        # (image_id, bytes, w, h, fmt, caption, phash)
        ("i1", b"", 100, 100, "ppm", cap, 111),   # dup of i2, fewer pixels
        ("i2", b"", 200, 200, "ppm", cap, 111),   # phash-dup keeper
        ("i3", b"", 32, 100, "ppm", cap, 333),    # min side < 64
        ("i4", b"", 400, 100, "ppm", cap, 444),   # aspect 4.0 > 3.0
        ("i5", b"", 100, 100, "ppm", "hi there", 555),        # 2 tokens
        ("i6", b"", 500, 500, "ppm", "x", 111),   # gate-fail, same phash:
                                                  # must NOT steal rank 1
        ("i7", b"", 128, 128, "ppm", cap, 222),   # tie with i8 on pixels:
        ("i8", b"", 128, 128, "ppm", cap, 222),   # smaller id (i7) wins
        ("i9", b"", 100, 100, "ppm", " ".join(["t"] * 78), 999),  # 78 toks
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string,"
              " caption string, phash long")
    out = {r["image_id"]: r for r in curate_image_caption(df).collect()}
    assert len(out) == 9
    assert out["i1"]["drop_reason"] == "phash_dup"
    assert out["i2"]["keep"] and out["i2"]["drop_reason"] is None
    assert out["i3"]["drop_reason"] == "too_small"
    assert out["i4"]["drop_reason"] == "aspect"
    assert out["i5"]["drop_reason"] == "caption_len"
    assert out["i6"]["drop_reason"] == "caption_len"  # gate names the
    # FIRST failure; its 500x500 pixels must not evict i2 from the group
    assert out["i7"]["keep"]
    assert out["i8"]["drop_reason"] == "phash_dup"
    assert out["i9"]["drop_reason"] == "caption_len"
    # canonical-shape columns pass through untouched
    assert set(df.columns) < set(out["i2"].asDict())


def test_aspect_bucket_batches_assignment(spark):
    from delver_spark.operators.multimodal import (SDXL_BUCKETS,
                                                   aspect_bucket_batches,
                                                   bucket_boundaries_milli)

    # hand-computed assignments: milli-aspect vs the midpoint boundaries
    # (1024,1024) has r=1000, neighbors (960,1088) r=882 and (1088,960)
    # r=1133 -> boundaries 941 and 1067
    rows = [(1, 1024, 1024),   # 1000 -> bucket 8 (square)
            (2, 1066, 1000),   # 1066 < 1067 -> still square bucket
            (3, 1067, 1000),   # == boundary -> next bucket (9)
            (4, 100, 4000),    # extreme portrait -> bucket 0
            (5, 4000, 100),    # extreme landscape -> last bucket
            (6, 941, 1000)]    # == boundary 941 -> bucket 8
    df = spark.createDataFrame(rows, "image_id long, w int, h int")
    out = {r["image_id"]: r
           for r in aspect_bucket_batches(df, batch_size=4,
                                          order_col="image_id").collect()}
    assert out[1]["bucket_id"] == 8 and out[1]["bucket_w"] == 1024
    assert out[2]["bucket_id"] == 8
    assert out[3]["bucket_id"] == 9 and out[3]["bucket_w"] == 1088
    assert out[4]["bucket_id"] == 0 and out[4]["bucket_h"] == 2048
    assert out[5]["bucket_id"] == len(SDXL_BUCKETS) - 1
    assert out[6]["bucket_id"] == 8
    # batch dealing within the square bucket: ids 1, 2, 6 in order
    sq = sorted((r["image_id"], r["batch_idx"], r["slot"])
                for r in out.values() if r["bucket_id"] == 8)
    assert sq == [(1, 0, 0), (2, 0, 1), (6, 0, 2)]
    # non-ascending bucket list must raise
    with pytest.raises(ValueError):
        bucket_boundaries_milli([(1024, 1024), (512, 2048)])


def test_aspect_bucket_batches_scale_safe_equal(spark):
    from delver_spark.operators.multimodal import aspect_bucket_batches

    # 1000 synthetic images over the full ratio range, odd batch tails,
    # non-contiguous ids spanning multiple pid shards
    df = spark.range(1000).selectExpr(
        "id * 131 AS image_id",
        "CAST(64 + (id * 7919) % 1984 AS INT) AS w",
        "CAST(64 + (id * 104729) % 1984 AS INT) AS h")
    cols = ["image_id", "bucket_id", "bucket_w", "bucket_h",
            "batch_idx", "slot"]
    naive = sorted(tuple(r) for r in aspect_bucket_batches(
        df, batch_size=7).select(*cols).collect())
    safe = sorted(tuple(r) for r in aspect_bucket_batches(
        df, batch_size=7, scale_safe=True, chunk=4096)
        .select(*cols).collect())
    assert naive == safe
    # every batch except a bucket's tail is exactly full
    from collections import Counter
    sizes = Counter((r[1], r[4]) for r in naive)
    by_bucket = {}
    for (b, bi), n in sizes.items():
        by_bucket.setdefault(b, []).append((bi, n))
    for b, lst in by_bucket.items():
        lst.sort()
        assert all(n == 7 for _, n in lst[:-1])
        assert 1 <= lst[-1][1] <= 7


def test_cover_crop_exact():
    from delver_spark.operators.multimodal import _cover_crop, _resize_nn

    rng = np.random.default_rng(7)
    # exact-aspect: pure resize, no crop — must equal _resize_nn directly
    pix = rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
    assert (_cover_crop(pix, 128, 128) == _resize_nn(pix, 128, 128)).all()
    # width binds (image relatively taller): cover then center-crop rows
    pix = rng.integers(0, 256, (300, 100, 3), dtype=np.uint8)
    out = _cover_crop(pix, 50, 100)
    assert out.shape == (100, 50, 3)
    r = _resize_nn(pix, 300 * 50 // 100, 50)   # rh=150
    assert (out == r[(150 - 100) // 2: (150 - 100) // 2 + 100]).all()
    # height binds: crop columns
    pix = rng.integers(0, 256, (100, 300, 3), dtype=np.uint8)
    out = _cover_crop(pix, 100, 50)
    assert out.shape == (50, 100, 3)
    r = _resize_nn(pix, 50, 300 * 50 // 100)   # rw=150
    assert (out == r[:, 25:125]).all()


def test_resize_to_bucket_pipeline(spark):
    """curate → aspect-bucket → resize → pack: the full image-training
    prep chain on real (numpy-codec) payloads."""
    from delver_spark.operators.assemble import pack_shards
    from delver_spark.operators.multimodal import (_cover_crop,
                                                   aspect_bucket_batches,
                                                   aspect_bucket_dims,
                                                   curate_image_caption,
                                                   resize_to_bucket)
    from delver_spark.fixtures.codecs import decode, phash64

    rng = np.random.default_rng(11)
    rows = []
    dims = [(200, 100), (100, 200), (150, 150), (280, 97), (64, 64),
            (20, 500)]  # last fails the 3:1 aspect gate (280/97 = 2.89 ok)
    pix_by_id = {}
    for i, (w, h) in enumerate(dims):
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        iid = f"i{i}"
        pix_by_id[iid] = pix
        rows.append((iid, bytearray(encode(pix, "ppm")), w, h, "ppm",
                     "a fine caption here", phash64(pix)))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")

    from pyspark.sql import functions as F

    kept = curate_image_caption(df, min_side=16).filter("keep") \
        .drop("drop_reason", "keep")
    assert kept.count() == 5  # i5 dropped by the aspect gate
    buckets = [(64, 128), (96, 96), (128, 64)]
    # the payload path composes the NARROW dims assignment (no shuffle);
    # batch dealing runs on metadata and must agree on the dims columns
    bucketed = aspect_bucket_dims(kept, buckets=buckets)
    batches = aspect_bucket_batches(
        kept.drop("bytes").withColumn(
            "img_seq", F.expr("CAST(substring(image_id, 2) AS BIGINT)")),
        buckets=buckets, batch_size=2, order_col="img_seq")
    dims_a = sorted((r["image_id"], r["bucket_id"], r["bucket_w"],
                     r["bucket_h"]) for r in bucketed.collect())
    dims_b = sorted((r["image_id"], r["bucket_id"], r["bucket_w"],
                     r["bucket_h"]) for r in batches.collect())
    assert dims_a == dims_b
    resized = resize_to_bucket(bucketed)
    got = {r["image_id"]: r for r in resized.collect()}
    assert len(got) == 5
    for iid, r in got.items():
        pix = decode(bytes(r["bytes"]), "ppm")
        assert pix.shape == (r["h"], r["w"], 3)
        # bit-exact vs the local reference computation (ppm lossless)
        assert (pix == _cover_crop(pix_by_id[iid], r["w"], r["h"])).all()
    # pack the re-encoded stream into shards; byte accounting must be exact
    packed = pack_shards(
        resized.selectExpr("image_id",
                           "CAST(substring(image_id, 2) AS BIGINT) AS seq",
                           "CAST(octet_length(bytes) AS BIGINT) AS nbytes"),
        "nbytes", "seq", 20000)
    p = {r["image_id"]: r for r in packed.collect()}
    assert p["i0"]["shard_id"] == 0 and p["i0"]["offset_in_shard"] == 0
    # exact shard ids + within-shard offsets: recompute from the
    # seq-ordered sizes
    ordered = sorted(p.values(), key=lambda r: r["seq"])
    c = 0
    starts = {}
    for r in ordered:
        sid = c // 20000
        assert r["shard_id"] == sid
        starts.setdefault(sid, c)
        assert r["offset_in_shard"] == c - starts[sid]
        c += r["nbytes"]


def test_resize_images_direct_equals_socket(spark, tmp_path):
    """The task-local-scan resize must be byte-identical to the
    aspect_bucket_dims -> resize_to_bucket socket plan, with and
    without a kept-id filter."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from delver_spark.operators.multimodal import (aspect_bucket_dims,
                                                   resize_images_direct,
                                                   resize_to_bucket)

    rng = np.random.default_rng(5)
    n = 60
    ids, blobs, ws, hs, fmts = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(16, 200))
        h = int(rng.integers(16, 200))
        fmt = "ppm" if i % 2 else "qjpg"
        ids.append(f"p{i:04d}")
        blobs.append(encode(rng.integers(0, 256, (h, w, 3),
                                         dtype=np.uint8), fmt))
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
    t = pa.table({"image_id": pa.array(ids), "bytes": pa.array(blobs,
                  pa.binary()), "w": pa.array(ws, pa.int32()),
                  "h": pa.array(hs, pa.int32()), "fmt": pa.array(fmts)})
    d = tmp_path / "imgs"
    d.mkdir()
    # two files, small row groups -> several splits
    pq.write_table(t.slice(0, 31), str(d / "a.parquet"), row_group_size=8)
    pq.write_table(t.slice(31), str(d / "b.parquet"), row_group_size=8)

    buckets = [(32, 96), (48, 80), (64, 64), (80, 48), (96, 32)]
    df = spark.read.parquet(str(d))

    def key(rows):
        return sorted((r["image_id"], r["w"], r["h"], r["fmt"],
                       bytes(r["bytes"])) for r in rows)

    socket = key(resize_to_bucket(
        aspect_bucket_dims(df, buckets=buckets), out_fmt="ppm").collect())
    direct = key(resize_images_direct(
        spark, str(d), buckets=buckets, out_fmt="ppm").collect())
    assert socket == direct and len(direct) == n

    kept = [f"p{i:04d}" for i in range(0, n, 3)]
    direct_k = key(resize_images_direct(
        spark, str(d), buckets=buckets, out_fmt="ppm",
        kept_ids=kept).collect())
    socket_k = key(resize_to_bucket(
        aspect_bucket_dims(df.filter(F.col("image_id").isin(kept)),
                           buckets=buckets), out_fmt="ppm").collect())
    assert direct_k == socket_k and len(direct_k) == len(kept)

    # out_dir mode: tasks write payload shards, the engine sees only the
    # manifest; reading the shards back must reproduce the socket output
    od = tmp_path / "resized"
    manifest = resize_images_direct(
        spark, str(d), buckets=buckets, out_fmt="ppm",
        out_dir=str(od)).collect()
    assert len(manifest) == n and all("bytes" not in r.asDict()
                                      for r in manifest)
    written = key(spark.read.parquet(str(od)).collect())
    assert written == socket
    m = {r["image_id"]: r for r in manifest}
    for iid, w, h, fmt, blob in written:
        assert m[iid]["nbytes"] == len(blob)
        assert m[iid]["shard_path"].startswith(str(od))


def test_caption_alignment_filter(spark):
    import math

    from delver_spark.operators.multimodal import caption_alignment_filter

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    a = unit([1.0, 0.0, 0.0, 0.0])
    rows = [
        # (pair, img, txt, expected at t=0.28)
        ("same", a, a, True),                      # cos 1.0
        ("orth", a, unit([0.0, 1.0, 0.0, 0.0]), False),   # cos 0.0
        ("neg", a, [-x for x in a], False),        # cos -1: dot>0 guard
        ("cos50", a, unit([0.5, math.sqrt(0.75), 0.0, 0.0]), True),  # 0.5
        ("cos25", a, unit([0.25, math.sqrt(1 - 0.0625), 0.0, 0.0]),
         False),                                   # 0.25 < 0.28
        ("cos30", a, unit([0.30, math.sqrt(1 - 0.09), 0.0, 0.0]), True),
    ]
    df = spark.createDataFrame(
        [(p, i, t) for p, i, t, _ in rows],
        "pair string, img_emb array<float>, txt_emb array<float>")
    out = {r["pair"]: r for r in caption_alignment_filter(df).collect()}
    for p, _, _, want in rows:
        assert out[p]["aligned"] == want, p
    # exact boundary: cos == threshold passes (>=), checked with crafted
    # integer-exact quantized vectors: img=(1,0), txt=(0.28, sqrt(..)) at
    # threshold 280 — quantized dot*1000 == 280 * |a||b| exactly only if
    # norms cooperate; instead pin the integer score column directly
    assert out["same"]["align_milli2"] == 1000 * 1000


def test_video_keyframes(spark):
    from delver_spark.fixtures.codecs import phash64
    from delver_spark.operators.multimodal import video_keyframes

    w, h = 16, 16
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    b = 255 - a                       # inverted scene: far phash
    frames = [a, a, a, b, b, a]       # static span, cut, static, cut back
    blob = (w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + len(frames).to_bytes(4, "little")
            + b"".join(f.tobytes() for f in frames))
    df = spark.createDataFrame([("v0", blob, "fake-rawrgb")],
                               "video_id string, bytes binary, fmt string")
    out = sorted((r["frame_idx"], r["phash"]) for r in
                 video_keyframes(df, every_n=1, hamming_max=6).collect())
    # duplicates of the last KEPT frame collapse; scene changes survive
    assert [i for i, _ in out] == [0, 3, 5]
    assert out[0][1] == phash64(a) and out[1][1] == phash64(b)
    # hamming_max=64 keeps only the first frame (everything "similar")
    only_first = video_keyframes(df, hamming_max=64).collect()
    assert [r["frame_idx"] for r in only_first] == [0]


def test_curate_skew_safe_equal(spark):
    """skew_safe (max_by keeper + join) must equal the window plan,
    including on a mass-duplicated phash and gate-failing rows."""
    from delver_spark.operators.multimodal import curate_image_caption

    cap = "a perfectly fine caption"
    rows = [("dup%04d" % i, b"", 100 + (i % 7), 100, "ppm", cap, 777)
            for i in range(500)]                    # one hot phash
    rows += [("solo", b"", 90, 90, "ppm", cap, 5),
             ("badcap", b"", 90, 90, "ppm", "x", 777),   # gate-fail in hot
             ("tiny", b"", 8, 8, "ppm", cap, 777),       # gate-fail in hot
             # null phash rows (upstream decode failures) must survive
             # BOTH plans identically (code-review r4-s5: the equi-join
             # dropped them); null w exercises the keeper null ordering
             ("nullp1", b"", 70, 70, "ppm", cap, None),
             ("nullp2", b"", 60, 60, "ppm", cap, None),
             ("nullw", b"", None, 80, "ppm", cap, 888),
             ("nullcap", b"", 80, 80, "ppm", None, 888),
             ("fullw", b"", 80, 80, "ppm", cap, 888)]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string,"
              " caption string, phash long")
    cols = ["image_id", "drop_reason", "keep"]
    a = sorted(tuple(r) for r in
               curate_image_caption(df, min_side=16).select(*cols).collect())
    b = sorted(tuple(r) for r in
               curate_image_caption(df, min_side=16, skew_safe=True)
               .select(*cols).collect())
    assert a == b
    keepers = [r for r in a if r[2]]
    # hot-phash keeper: max pixels (w=106), smallest id among w==106;
    # null-phash rows form their own group (nullp1 = bigger keeper);
    # NULL w/h/caption rows are explicit missing_meta drops (ADVICE r4:
    # before the leading gate branch they silently passed every gate)
    assert ("dup0006", None, True) in keepers and ("solo", None, True) in keepers
    assert ("nullp1", None, True) in keepers and ("fullw", None, True) in keepers
    assert ("nullp2", "phash_dup", False) in a
    assert ("nullw", "missing_meta", False) in a
    assert ("nullcap", "missing_meta", False) in a
    assert len(keepers) == 4


def test_resize_images_direct_verdict_dir(spark, tmp_path):
    """The corpus-scale kept-set path (verdict_dir: hive-partitioned,
    range-sorted verdict table; per-row-group interval probe) must be
    byte-identical to the kept_ids broadcast path — including row
    groups with ZERO kept ids (payload read skipped entirely)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delver_spark.operators.multimodal import (
        resize_images_direct,
        write_curation_verdict,
    )

    rng = np.random.default_rng(9)
    n = 64
    ids, blobs, ws, hs = [], [], [], []
    for i in range(n):
        w = int(rng.integers(16, 120))
        h = int(rng.integers(16, 120))
        ids.append(f"v{i:04d}")
        blobs.append(encode(rng.integers(0, 256, (h, w, 3),
                                         dtype=np.uint8), "ppm"))
        ws.append(w)
        hs.append(h)
    t = pa.table({"image_id": pa.array(ids),
                  "bytes": pa.array(blobs, pa.binary()),
                  "w": pa.array(ws, pa.int32()),
                  "h": pa.array(hs, pa.int32()),
                  "fmt": pa.array(["ppm"] * n)})
    d = tmp_path / "imgs"
    d.mkdir()
    pq.write_table(t, str(d / "a.parquet"), row_group_size=8)

    # keep none of row groups 2-3 (ids v0016..v0031): exercises the
    # skip-payload-read branch; elsewhere keep every other id
    kept = [f"v{i:04d}" for i in range(n) if not 16 <= i < 32 and i % 2]
    verdicts = spark.createDataFrame(
        [(i, i in set(kept)) for i in ids], "image_id string, kept boolean")
    vd = tmp_path / "verdict"
    write_curation_verdict(verdicts, str(vd), n_ranges=4)

    buckets = [(32, 96), (64, 64), (96, 32)]

    def key(rows):
        return sorted((r["image_id"], r["w"], r["h"], r["fmt"],
                       bytes(r["bytes"])) for r in rows)

    by_ids = key(resize_images_direct(
        spark, str(d), buckets=buckets, kept_ids=kept).collect())
    by_verdict = key(resize_images_direct(
        spark, str(d), buckets=buckets, verdict_dir=str(vd)).collect())
    assert by_ids == by_verdict and len(by_verdict) == len(kept)

    # drop_reason-shaped input (curate_image_caption output contract)
    curated = spark.createDataFrame(
        [(i, None if i in set(kept) else "too_small") for i in ids],
        "image_id string, drop_reason string")
    vd2 = tmp_path / "verdict2"
    write_curation_verdict(curated, str(vd2), n_ranges=2)
    by_verdict2 = key(resize_images_direct(
        spark, str(d), buckets=buckets, verdict_dir=str(vd2)).collect())
    assert by_verdict2 == by_ids

    with pytest.raises(ValueError, match="not both"):
        resize_images_direct(spark, str(d), kept_ids=kept,
                             verdict_dir=str(vd))


def test_resize_direct_carry_cols_to_webdataset(spark, tmp_path):
    """carry_cols copies input columns unchanged into the written
    payload shards (caption rides along), making the resized table a
    self-contained pair table the WebDataset export shards directly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from delver_spark.operators.multimodal import resize_images_direct
    from delver_spark.operators.webdataset import (export_webdataset,
                                                   read_webdataset)

    rng = np.random.default_rng(11)
    n = 24
    rows = []
    for i in range(n):
        w, h = int(rng.integers(16, 96)), int(rng.integers(16, 96))
        fmt = "ppm" if i % 2 else "qjpg"
        rows.append((f"im{i:04d}",
                     encode(rng.integers(0, 256, (h, w, 3),
                                         dtype=np.uint8), fmt),
                     w, h, fmt,
                     None if i % 7 == 0 else f"a cap {i}"))
    t = pa.table({"image_id": pa.array([r[0] for r in rows]),
                  "bytes": pa.array([r[1] for r in rows], pa.binary()),
                  "w": pa.array([r[2] for r in rows], pa.int32()),
                  "h": pa.array([r[3] for r in rows], pa.int32()),
                  "fmt": pa.array([r[4] for r in rows]),
                  "caption": pa.array([r[5] for r in rows], pa.string())})
    d = tmp_path / "src"
    d.mkdir()
    pq.write_table(t, str(d / "a.parquet"), row_group_size=7)

    buckets = [(32, 96), (64, 64), (96, 32)]
    out = tmp_path / "resized"
    man = resize_images_direct(spark, str(d), buckets=buckets,
                               out_dir=str(out),
                               carry_cols=["caption"]).collect()
    assert len(man) == n  # manifest schema unchanged
    shards = spark.read.parquet(str(out))
    caps = {r.image_id: r.caption for r in
            shards.select("image_id", "caption").collect()}
    assert caps == {r[0]: r[5] for r in rows}

    wds = tmp_path / "wds"
    export_webdataset(spark, str(out), str(wds), 64 * 1024)
    back = {r.image_id: (r.caption, r.fmt) for r in
            read_webdataset(spark, str(wds)).collect()}
    assert set(back) == set(caps)
    assert all(back[k][0] == caps[k] for k in caps)

    with pytest.raises(ValueError, match="requires out_dir"):
        resize_images_direct(spark, str(d), buckets=buckets,
                             carry_cols=["caption"])
    # r5-s9 review pin: a carried column must never shadow a resized
    # output column (carry 'fmt' would label re-encoded bytes with the
    # ORIGINAL format in the written shards)
    with pytest.raises(ValueError, match="shadow"):
        resize_images_direct(spark, str(d), buckets=buckets,
                             out_dir=str(tmp_path / "x"),
                             carry_cols=["fmt"])
