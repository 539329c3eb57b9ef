"""Oracle semantic invariants (the oracle IS the crawl-order spec, so these
pin the behaviors ported from the reference — SURVEY §2.5, §5.2-2)."""

import collections

import pytest

from delver_spark.fixtures.gen import generate_corpus
from delver_spark.oracle.crawler import OracleCrawler, Page, run_oracle


@pytest.fixture(scope="module")
def small(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("oracle_corpus"))
    params = generate_corpus(d, n_pages=200, n_hosts=12, seed=7, max_rounds=30)
    return d, params


def test_politeness_budget_respected(small):
    d, params = small
    res = run_oracle(d)
    per_round_host = collections.Counter()
    per_round = collections.Counter()
    for r in res.crawl_order:
        per_round_host[(r["round"], r["host"])] += 1
        per_round[r["round"]] += 1
    assert max(per_round_host.values()) <= params["per_host_budget"]
    assert max(per_round.values()) <= params["global_budget"]


def test_depth_bounded(small):
    d, params = small
    res = run_oracle(d)
    assert all(0 <= r["depth"] <= params["max_depth"] for r in res.crawl_order)


def test_seq_is_contiguous_and_round_monotone(small):
    d, _ = small
    res = run_oracle(d)
    seqs = [r["seq"] for r in res.crawl_order]
    assert seqs == list(range(len(seqs)))
    rounds = [r["round"] for r in res.crawl_order]
    assert rounds == sorted(rounds)


def test_fetched_urls_in_bloom(small):
    d, _ = small
    res = run_oracle(d)
    for r in res.crawl_order:
        assert res.bloom.contains(r["url_canon"])


def test_robots_block_no_bad_paths_after_refill():
    """Domains whose robots disallow /bad never get /bad urls via refill
    (allow-on-failure for the malformed 5% is separately exercised by the
    generator's domain mix)."""
    pages = {
        "http://a.test/p/1": Page("http://a.test/p/1",
                                  '<a href="http://b.test/bad/1">x</a> '
                                  '<a href="http://b.test/p/2">y</a>', "a.test"),
        "http://b.test/bad/1": Page("http://b.test/bad/1", "no links", "b.test"),
        "http://b.test/p/2": Page("http://b.test/p/2", "no links", "b.test"),
    }
    robots = {"b.test": "User-agent: *\nDisallow: /bad\n"}
    oc = OracleCrawler(pages, robots, [("http://a.test/p/1", 0)],
                       max_depth=2, bloom_max_n=100, bloom_p=0.01)
    res = oc.run()
    fetched = [r["url_canon"] for r in res.crawl_order]
    assert "http://b.test/p/2" in fetched
    assert "http://b.test/bad/1" not in fetched


def test_same_domain_subdomain_counts(small):
    """old./www. subdomains share sld_tld → same-domain gate admits them
    (dfs_basic_test.go:44-99 subdomain case)."""
    pages = {
        "http://example.test/p/1": Page(
            "http://example.test/p/1",
            '<a href="http://old.example.test/p/2">x</a>', "example.test"),
        "http://old.example.test/p/2": Page(
            "http://old.example.test/p/2", "end", "old.example.test"),
    }
    oc = OracleCrawler(pages, {}, [("http://example.test/p/1", 0)],
                       max_depth=2, bloom_max_n=100, bloom_p=0.01)
    res = oc.run()
    assert [r["url_canon"] for r in res.crawl_order] == [
        "http://example.test/p/1", "http://old.example.test/p/2"]
    # depth inherited +1, same domain → frontier not url_store
    assert res.crawl_order[1]["depth"] == 1


def test_depth_gate_stops_expansion():
    pages = {
        "http://a.test/1": Page("http://a.test/1", '<a href="/2">x</a>', "a.test"),
        "http://a.test/2": Page("http://a.test/2", '<a href="/3">x</a>', "a.test"),
        "http://a.test/3": Page("http://a.test/3", '<a href="/4">x</a>', "a.test"),
    }
    oc = OracleCrawler(pages, {}, [("http://a.test/1", 0)],
                       max_depth=1, bloom_max_n=100, bloom_p=0.01)
    res = oc.run()
    # depth 0 fetch → enqueue depth 1; depth 1 < maxDepth fails → stop
    assert [r["url_canon"] for r in res.crawl_order] == [
        "http://a.test/1", "http://a.test/2"]


def test_refill_lexicographic_domain_and_url_order():
    cap = ('<a href="http://zz.test/b">1</a> <a href="http://zz.test/a">2</a> '
           '<a href="http://bb.test/x">3</a>')
    pages = {"http://a.test/1": Page("http://a.test/1", cap, "a.test")}
    oc = OracleCrawler(pages, {}, [("http://a.test/1", 0)],
                       max_depth=2, bloom_max_n=100, bloom_p=0.01)
    res = oc.run()
    order = [r["url_canon"] for r in res.crawl_order]
    # round 1 refills bb.test first (lexicographic domain), then zz.test
    # with urls in lexicographic url order
    assert order == ["http://a.test/1", "http://bb.test/x",
                     "http://zz.test/a", "http://zz.test/b"]


def test_duplicate_canonical_double_enqueue_quirk():
    """Two raw-distinct hrefs resolving to one URL are both enqueued
    (SetMany-after-page quirk, dfs_basic.go:87-123)."""
    cap = '<a href="/x">1</a> <a href="http://a.test/x">2</a>'
    pages = {
        "http://a.test/1": Page("http://a.test/1", cap, "a.test"),
        "http://a.test/x": Page("http://a.test/x", "end", "a.test"),
    }
    oc = OracleCrawler(pages, {}, [("http://a.test/1", 0)],
                       max_depth=2, bloom_max_n=100, bloom_p=0.01)
    res = oc.run()
    fetched = [r["url_canon"] for r in res.crawl_order]
    assert fetched == ["http://a.test/1", "http://a.test/x", "http://a.test/x"]
