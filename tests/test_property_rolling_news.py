"""Property-based pins (hypothesis): the rolling bloom against a
straightforward model, and the news URL predicate's scalar twin against
an independently-written naive re-implementation."""

from urllib.parse import urlsplit

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from delver_spark.engine.bloom import (
    BloomExceedsErrorRate,
    BloomFilter,
    BloomOverflow,
)
from delver_spark.engine.rolling_bloom import RollingBloomFilter
from delver_spark.functions.news import (
    BLACKLISTED_EXTENSIONS,
    BLACKLISTED_PATHS,
    url_allowed_py,
)


class ModelRolling:
    """Independent model of rolling_bloom.go's writeTransaction/rotate:
    a list of plain BloomFilters driven by the same op semantics."""

    def __init__(self, count, max_n, p):
        self.count, self.max_n, self.p = count, max_n, p
        self.gens = [BloomFilter(max_n, p)]

    def _rotate(self):
        fresh = BloomFilter(self.max_n, self.p)
        self.gens = [fresh] + (self.gens[:-1]
                               if len(self.gens) == self.count else self.gens)

    def add_many(self, items):
        cur = self.gens[0]
        try:
            cur.add_many(items)
            return
        except (BloomOverflow, BloomExceedsErrorRate):
            self._rotate()
            # lost-insert quirk: retry targets the OLD bloom and fails
            try:
                cur.add_many(items)
            except (BloomOverflow, BloomExceedsErrorRate):
                pass

    def add(self, item):
        cur = self.gens[0]
        try:
            cur.add(item)
        except (BloomOverflow, BloomExceedsErrorRate):
            self._rotate()
            try:
                cur.add(item)
            except (BloomOverflow, BloomExceedsErrorRate):
                pass


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.booleans(),
              st.lists(st.integers(0, 200), min_size=1, max_size=6)),
    max_size=40))
def test_rolling_bloom_matches_model(ops):
    """Any interleaving of add/add_many drives the engine filter and the
    model to identical generation bitmaps and counts."""
    rbf = RollingBloomFilter(3, 12, 0.1)
    model = ModelRolling(3, 12, 0.1)
    for is_many, vals in ops:
        items = [f"v{v}".encode() for v in vals]
        if is_many:
            rbf.add_many(items)
            model.add_many(items)
        else:
            rbf.add(items[0])
            model.add(items[0])
    assert len(rbf.blooms) == len(model.gens)
    for a, b in zip(rbf.blooms, model.gens):
        assert a.n == b.n
        assert np.array_equal(a.bit_positions(), b.bit_positions())


def _naive_urlAllowed(url: str, origin: str) -> bool:
    """Line-by-line naive reading of news.go:227-290, written separately
    from functions/news.py."""
    u, o = urlsplit(url), urlsplit(origin)
    if u.netloc != o.netloc:
        return False
    if any(u.path.endswith(e) for e in BLACKLISTED_EXTENSIONS):
        return False
    toks = [t for t in u.path.split("/") if t]
    if not toks:
        return False
    if "article" in toks[0]:
        looks = True
    elif sum(1 for t in toks if len(t) <= 20) == len(toks):
        looks = False
    elif any(b in toks[0] for b in BLACKLISTED_PATHS):
        looks = False
    else:
        looks = True
    if not looks:
        return False
    if ":" in u.path and "=" in u.path:
        return False
    return True


_SEG = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-_.:=", min_size=0,
    max_size=25)


@settings(max_examples=300, deadline=None)
@given(st.lists(_SEG, max_size=5), st.booleans(),
       st.sampled_from(["", ".jpg", ".css", ".html", ".mp3"]))
def test_news_predicate_matches_naive(segments, same_host, suffix):
    host = "test.com" if same_host else "other.com"
    path = "/" + "/".join(segments) + suffix
    url = f"http://{host}{path}"
    origin = "http://test.com/feed"
    assert url_allowed_py(url, origin) == _naive_urlAllowed(url, origin), url
