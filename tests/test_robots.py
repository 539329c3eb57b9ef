"""Robots parsing/matching vs the reference's test robots.txt
(/root/reference/data/test/robots.txt, frontier/robotstxt_test.go:21-43)."""

import os

from delver_spark.engine.robots import allowed, allowed_batch, parse_robots

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "test")


def _rules():
    with open(os.path.join(DATA, "robots.txt")) as f:
        return parse_robots(f.read())


def test_reference_robots_file():
    rules = _rules()
    assert allowed(rules, "/good")
    assert allowed(rules, "/alsogood")
    assert not allowed(rules, "/bad")
    assert not allowed(rules, "/alsobad")


def test_no_match_is_allowed():
    assert allowed(_rules(), "/unrelated")


def test_longest_prefix_wins():
    rules = parse_robots("User-agent: *\nDisallow: /a\nAllow: /a/b\n")
    assert not allowed(rules, "/a/x")
    assert allowed(rules, "/a/b/c")


def test_malformed_allows_everything():
    # allow-on-parse-failure (robotstxt.go:59-70)
    assert parse_robots("%%% not robots at all") == []
    assert allowed(parse_robots("%%%"), "/anything")
    assert parse_robots(None) == []
    assert parse_robots("") == []


def test_empty_disallow_means_allow_all():
    rules = parse_robots("User-agent: *\nDisallow:\n")
    assert allowed(rules, "/x")


def test_other_agent_group_ignored():
    rules = parse_robots("User-agent: bot\nDisallow: /\nUser-agent: *\nAllow: /\n")
    assert allowed(rules, "/x")


def test_batch():
    rules_by_host = {"h1.test": parse_robots("User-agent: *\nDisallow: /bad\n")}
    out = allowed_batch(rules_by_host,
                        ["h1.test", "h1.test", "h2.test"],
                        ["/bad/x", "/good", "/bad/x"])
    assert out.tolist() == [False, True, True]
