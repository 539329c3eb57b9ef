"""Murmur3 x64_128 goldens + scalar/vectorized equivalence."""

import random

import numpy as np
import pytest

from delver_spark.engine.murmur import hash128, hash128_batch


def test_public_vectors():
    # mmh3 README vector: mmh3.hash64('foo') == (-2129773440516405919, 9128664383759220103)
    h1, h2 = hash128(b"foo")
    s1 = h1 - (1 << 64) if h1 >= (1 << 63) else h1
    s2 = h2 - (1 << 64) if h2 >= (1 << 63) else h2
    assert (s1, s2) == (-2129773440516405919, 9128664383759220103)
    # mmh3.hash128('foo') == 168394135621993849475852668931176482145
    assert h1 + (h2 << 64) == 168394135621993849475852668931176482145
    assert hash128(b"") == (0, 0)


def test_str_utf8():
    assert hash128("foo") == hash128(b"foo")
    assert hash128("héllo") == hash128("héllo".encode("utf-8"))


@pytest.mark.parametrize("seed", [0, 1, 42])
def test_batch_matches_scalar(seed):
    rng = random.Random(seed)
    items = [bytes(rng.randrange(256) for _ in range(L))
             for L in list(range(0, 40)) + [15, 16, 17, 31, 32, 33, 63, 64, 65, 127, 128, 200]]
    b1, b2 = hash128_batch(items, seed=seed)
    for i, it in enumerate(items):
        assert (int(b1[i]), int(b2[i])) == hash128(it, seed=seed), (i, len(it))


def test_batch_empty():
    b1, b2 = hash128_batch([])
    assert len(b1) == 0 and len(b2) == 0


def test_batch_dtype():
    b1, b2 = hash128_batch(["a", "bb", "ccc"])
    assert b1.dtype == np.uint64 and b2.dtype == np.uint64
