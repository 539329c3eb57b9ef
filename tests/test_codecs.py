"""Codec + corpus generator invariants (FIXTURES.md §A)."""

import numpy as np

from delver_spark.fixtures.codecs import (
    decode,
    encode,
    phash64,
    pixel_md5,
    psnr,
)


def _pix(seed=3, h=24, w=16):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_lossless_roundtrip():
    pix = _pix()
    out = decode(encode(pix, "ppm"), "ppm")
    assert np.array_equal(out, pix)  # allclose == exact for lossless


def test_qjpg_psnr_contract():
    # lossy: PSNR >= 40 dB per BASELINE.json input_hint
    for seed in range(5):
        pix = _pix(seed)
        out = decode(encode(pix, "qjpg"), "qjpg")
        assert psnr(pix, out) >= 40.0


def test_phash_deterministic_and_signed64():
    pix = _pix()
    a, b = phash64(pix), phash64(pix.copy())
    assert a == b
    assert -(1 << 63) <= a < (1 << 63)


def test_phash_differs_for_structured_change():
    pix = _pix()
    other = pix.copy()
    other[:12] = 255  # change half the image
    assert phash64(pix) != phash64(other)


def test_generator_determinism(tmp_path):
    from delver_spark.fixtures.gen import generate_corpus
    import pyarrow.parquet as pq

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate_corpus(a, n_pages=50, n_hosts=5, seed=9)
    generate_corpus(b, n_pages=50, n_hosts=5, seed=9)
    ta = pq.read_table(a + "/pages.parquet")
    tb = pq.read_table(b + "/pages.parquet")
    assert ta.equals(tb)
    assert pixel_md5(_pix()) == pixel_md5(_pix())


def test_generator_zipf_skew(tmp_path):
    # hot-host skew is deliberate (SURVEY §4.2.1)
    import collections

    import pyarrow.parquet as pq

    from delver_spark.engine.urlnorm import sld_tld
    from delver_spark.fixtures.gen import generate_corpus

    d = str(tmp_path / "z")
    generate_corpus(d, n_pages=500, n_hosts=20, seed=1)
    hosts = pq.read_table(d + "/pages.parquet", columns=["host"]).column(0).to_pylist()
    counts = collections.Counter(sld_tld(h) for h in hosts)
    top = counts.most_common(1)[0][1]
    assert top > 2 * (500 / 20)  # hottest domain >> uniform share
