"""Bloom filter behavior per /root/reference/resource/bloom/bloom_test.go:17-99."""

import math

import numpy as np
import pytest

from delver_spark.engine.bloom import BloomExceedsErrorRate, BloomFilter, BloomOverflow


def test_parameter_formulas():
    # exact Go formulas: mFloat=-n*ln(p)/ln2^2 truncated; kFloat=m/n*ln2 ceil'd
    b = BloomFilter(1000, 0.01)
    m_float = -(1000 * math.log(0.01)) / (math.log(2) ** 2)
    assert b.m == int(m_float)
    assert b.k == math.ceil(float(b.m) / 1000 * math.log(2))


def test_p_one_coerced():
    b = BloomFilter(10, 1)
    assert b.p == 0.999


def test_no_false_negatives():
    b = BloomFilter(4000, 0.01)
    items = [f"http://d{i}.test/p/{i}" for i in range(1000)]
    for it in items[:100]:
        b.add(it)
    b.add_many(items[100:])
    for it in items:
        assert b.contains(it)
    assert b.contains_batch(items).all()


def test_sampled_non_members_false():
    b = BloomFilter(4000, 0.01)
    b.add_many([f"url-{i}" for i in range(1000)])
    misses = b.contains_batch([f"other-{i}" for i in range(1000)])
    # p=0.01 → expect ~10 false positives; far below half
    assert misses.sum() < 50


def test_overflow_at_max_n_one():
    b = BloomFilter(1, 0.01)  # same params as bloom_test.go:38-47
    b.add("a")
    with pytest.raises((BloomOverflow, BloomExceedsErrorRate)):
        b.add("b")


def test_set_many_single_bounds_check_overshoots():
    # reference quirk (bloom.go:152-168): one bounds check, then adds all
    b = BloomFilter(10, 0.01)
    b.add_many([f"x{i}" for i in range(50)])  # overshoots maxN in one call
    assert b.n == 50
    with pytest.raises((BloomOverflow, BloomExceedsErrorRate)):
        b.add("y")


def test_roundtrip():
    b = BloomFilter(100, 0.01)
    b.add_many(["a", "b", "c"])
    b2 = BloomFilter.from_bytes(b.to_bytes())
    assert b2.max_n == b.max_n and b2.p == b.p and b2.n == b.n
    assert np.array_equal(b2.words, b.words)
    assert np.array_equal(b2.bit_positions(), b.bit_positions())
    assert b2.contains("a") and not b2.contains("zzz")


def test_probe_sequence_matches_reference_formula():
    from delver_spark.engine.murmur import hash128

    b = BloomFilter(1000, 0.01)
    upper, lower = hash128(b"http://example.com/")
    want = [((lower + i * upper + i * i) & ((1 << 64) - 1)) % b.m for i in range(b.k)]
    got = b.probes_batch([b"http://example.com/"])[0].tolist()
    assert got == want


def test_merge_words():
    a = BloomFilter(100, 0.01)
    b = BloomFilter(100, 0.01)
    a.add("left")
    b.add("right")
    a.merge_words(b.words, added_n=b.n)
    assert a.contains("left") and a.contains("right") and a.n == 2
