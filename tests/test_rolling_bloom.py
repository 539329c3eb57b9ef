"""RollingBloomFilter: 1:1 ports of the reference's rolling_bloom_test.go
plus deliberate pins of the rotation quirks (SURVEY §1.4, VERDICT r1 #3),
and the crawl-level test that crosses a rotation boundary and still
matches the oracle bit-for-bit.
"""

import numpy as np
import pytest

from delver_spark.engine.bloom import BloomFilter
from delver_spark.engine.rolling_bloom import RollingBloomFilter


# -- 1:1 ports of rolling_bloom_test.go --------------------------------------

def test_create_rolling_bloom_file_exists(tmp_path):
    """rolling_bloom_test.go:TestCreateRollingBloomFileExists — an
    existing bloom file is loaded as the single generation."""
    path = str(tmp_path / "rolling-bloom-exist")
    max_n, p = 10000, 0.1
    first = BloomFilter(max_n, p)
    v = bytes([1, 3, 5, 7, 9])
    first.add(v)
    with open(path, "wb") as f:
        f.write(first.to_bytes())

    pbloom = RollingBloomFilter.load(3, max_n, p, path)
    assert pbloom is not None
    assert pbloom.contains(v)


def test_create_rolling_bloom_file_doesnt_exist(tmp_path):
    """rolling_bloom_test.go:TestCreateRollingBloomFileDoesntExist."""
    path = str(tmp_path / "rolling-bloom-no-exist")
    pbloom = RollingBloomFilter.load(3, 10000, 0.1, path)
    assert pbloom is not None
    assert len(pbloom.blooms) == 1 and pbloom.n == 0


def test_rolling_bloom_set_and_get():
    """rolling_bloom_test.go:TestRollingBloomSetAndGet."""
    bloom = RollingBloomFilter(3, 10000, 0.01)
    val = bytes([1, 2, 3, 4, 5])
    assert bloom.add(val) is None
    assert bloom.contains(val)


def test_rolling_bloom_set_many_and_get():
    """rolling_bloom_test.go:TestRollingBloomSetManyAndGet."""
    bloom = RollingBloomFilter(3, 10000, 0.01)
    vals = [bytes([1, 2, 3, 4, 5]), bytes([6, 7, 8, 9, 10]),
            bytes([11, 12, 13, 14, 15])]
    assert bloom.add_many(vals) is None
    for val in vals:
        assert bloom.contains(val)


def test_rolling_bloom_close(tmp_path):
    """rolling_bloom_test.go:TestRollingBloomClose — close persists."""
    path = str(tmp_path / "rolling-bloom-close")
    import os
    assert not os.path.exists(path)
    bloom = RollingBloomFilter(3, 10000, 0.1)
    bloom.close(path)
    assert os.path.exists(path)


# -- rotation semantics + quirks ---------------------------------------------

def _fill_to_rotation(bloom: RollingBloomFilter, start: int = 0):
    """Add distinct items until a write fails (rotation fires); returns
    (items_inserted, lost_item, next_index)."""
    inserted = []
    i = start
    while True:
        item = f"item-{i}".encode()
        err = bloom.add(item)
        i += 1
        if err is not None:
            return inserted, item, i
        inserted.append(item)


def test_rotation_lost_insert_quirk():
    """The write that triggers rotation retries against the OLD
    generation (rolling_bloom.go:190-201) — the insert is LOST: no
    generation's bitmap changes (checked exactly, since `contains` can
    false-positive), yet a fresh generation now accepts the next write."""
    bloom = RollingBloomFilter(3, 16, 0.1)
    inserted, lost, i = _fill_to_rotation(bloom)
    # _fill_to_rotation already triggered the rotation: gen 1 is the old
    # full bloom, gen 0 is fresh and EMPTY — the lost insert set no bits
    # anywhere (gen 0 empty; gen 1 identical to a twin built from only
    # the successful inserts, with the same n)
    assert len(bloom.blooms) == 2          # rotation happened
    assert len(bloom.blooms[0].bit_positions()) == 0  # nothing written
    assert bloom.blooms[0].n == 0
    twin = BloomFilter(16, 0.1)
    for item in inserted:
        twin.add(item)
    assert np.array_equal(twin.bit_positions(),
                          bloom.blooms[1].bit_positions())
    assert bloom.blooms[1].n == len(inserted)
    nxt = f"item-{i}".encode()
    assert bloom.add(nxt) is None          # next write lands in gen 0
    assert bloom.contains(nxt)
    assert bloom.blooms[0].contains(nxt)
    for item in inserted:                  # old generation still readable
        assert bloom.contains(item)


def test_rotation_drops_oldest_at_capacity():
    """At bloom_count generations the oldest is dropped on rotation
    (rolling_bloom.go:168-172) — its bitmap leaves the filter. Checked
    exactly on the generation list (contains() can false-positive)."""
    bloom = RollingBloomFilter(2, 16, 0.1)
    gen_a_items, _, i = _fill_to_rotation(bloom)     # fill A → [B, A]
    assert len(bloom.blooms) == 2
    a_bits = bloom.blooms[1].bit_positions()
    gen_b_items, _, i = _fill_to_rotation(bloom, start=i)  # fill B → [C, B]
    # at capacity the second rotation DROPPED A; B survived as gen 1
    assert len(bloom.blooms) == 2
    twin_b = BloomFilter(16, 0.1)
    for item in gen_b_items:
        twin_b.add(item)
    assert np.array_equal(twin_b.bit_positions(),
                          bloom.blooms[1].bit_positions())
    assert not np.array_equal(a_bits, bloom.blooms[1].bit_positions())
    assert len(bloom.blooms[0].bit_positions()) == 0  # fresh gen 0
    assert all(bloom.contains(x) for x in gen_b_items)


def test_save_persists_gen0_only(tmp_path):
    """Reference Save quirk (rolling_bloom.go:148-155): only the newest
    generation survives a save/load cycle."""
    bloom = RollingBloomFilter(3, 16, 0.1)
    old_items, _, i = _fill_to_rotation(bloom)
    new_item = f"item-{i}".encode()
    assert bloom.add(new_item) is None
    path = str(tmp_path / "b")
    bloom.save(path)
    loaded = RollingBloomFilter.load(3, 16, 0.1, path)
    assert loaded.contains(new_item)
    assert not any(loaded.contains(x) for x in old_items)


def test_full_state_roundtrip():
    """Engine snapshots keep EVERY generation (to_bytes/from_bytes) so
    resume == uninterrupted holds across rotations."""
    bloom = RollingBloomFilter(3, 16, 0.1)
    old_items, _, i = _fill_to_rotation(bloom)
    assert bloom.add(f"item-{i}".encode()) is None
    back = RollingBloomFilter.from_bytes(bloom.to_bytes())
    assert back.bloom_count == 3 and len(back.blooms) == len(bloom.blooms)
    for a, b in zip(back.blooms, bloom.blooms):
        assert np.array_equal(a.bit_positions(), b.bit_positions())
        assert a.n == b.n
    assert all(back.contains(x) for x in old_items)


# -- crawl across a rotation boundary ----------------------------------------

@pytest.fixture(scope="module")
def rotation_corpus(tmp_path_factory):
    from delver_spark.fixtures.gen import generate_corpus

    d = str(tmp_path_factory.mktemp("corpus_rotation"))
    # bloom far smaller than the crawl's insert volume → rotation fires
    # mid-crawl; 3 generations so older seen-state persists across it
    generate_corpus(d, n_pages=150, n_hosts=8, seed=11, max_rounds=6,
                    bloom_max_n=60, bloom_count=3)
    return d


def test_crawl_across_rotation_matches_oracle(spark, rotation_corpus,
                                              tmp_path_factory):
    from delver_spark.operators.crawl import CrawlEngine
    from delver_spark.oracle.crawler import run_oracle

    oracle = run_oracle(rotation_corpus)
    assert len(oracle.bloom.blooms) > 1  # non-vacuous: rotation happened

    wd = str(tmp_path_factory.mktemp("crawl_rotation"))
    eng = CrawlEngine(spark, rotation_corpus, wd)
    eng.run()

    oo = [(r["seq"], r["url_canon"], r["round"]) for r in oracle.crawl_order]
    df = eng.crawl_order_df()
    so = list(df[["seq", "url_canon", "round"]].itertuples(index=False,
                                                           name=None))
    assert so == oo
    assert len(eng.bloom.blooms) == len(oracle.bloom.blooms)
    for a, b in zip(eng.bloom.blooms, oracle.bloom.blooms):
        assert np.array_equal(a.bit_positions(), b.bit_positions())
        assert a.n == b.n


def test_resume_across_rotation(spark, rotation_corpus, tmp_path_factory):
    """Snapshot/resume through a rotation boundary: the multi-generation
    state must round-trip so the resumed crawl stays oracle-equal."""
    from delver_spark.operators.crawl import CrawlEngine
    from delver_spark.oracle.crawler import run_oracle

    oracle = run_oracle(rotation_corpus)
    wd = str(tmp_path_factory.mktemp("crawl_rot_resume"))
    eng1 = CrawlEngine(spark, rotation_corpus, wd)
    eng1.run(max_rounds=3)
    eng2 = CrawlEngine.resume(spark, rotation_corpus, wd)
    eng2.run()
    oo = [(r["seq"], r["url_canon"]) for r in oracle.crawl_order]
    df = eng2.crawl_order_df()
    so = list(df[["seq", "url_canon"]].itertuples(index=False, name=None))
    assert so == oo
    for a, b in zip(eng2.bloom.blooms, oracle.bloom.blooms):
        assert np.array_equal(a.bit_positions(), b.bit_positions())
