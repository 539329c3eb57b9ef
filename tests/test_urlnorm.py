"""URL canonicalization / resolution / domain-key goldens (SURVEY §1.5)."""

from delver_spark.engine.urlnorm import (
    canonicalize,
    remove_dot_segments,
    resolve,
    sld,
    sld_tld,
)


def test_canonicalize_basic():
    assert canonicalize("HTTP://Example.COM/a/b") == "http://example.com/a/b"
    assert canonicalize("http://example.com") == "http://example.com/"
    assert canonicalize("http://example.com:80/x") == "http://example.com/x"
    assert canonicalize("https://example.com:443/x") == "https://example.com/x"
    assert canonicalize("http://example.com:8080/x") == "http://example.com:8080/x"


def test_canonicalize_dot_segments():
    assert canonicalize("http://h.test/a/./b/../c") == "http://h.test/a/c"
    assert canonicalize("http://h.test/../x") == "http://h.test/x"


def test_canonicalize_percent_decode_unreserved():
    assert canonicalize("http://h.test/%61%62%2Fc") == "http://h.test/ab%2Fc"
    assert canonicalize("http://h.test/a%20b") == "http://h.test/a%20b"
    # surviving escapes uppercased
    assert canonicalize("http://h.test/a%2fb") == "http://h.test/a%2Fb"


def test_canonicalize_query_and_fragment():
    assert canonicalize("http://h.test/p?b=2&a=1#frag") == "http://h.test/p?b=2&a=1"
    assert canonicalize("http://h.test/?q=%7E") == "http://h.test/?q=~"


def test_canonicalize_rejects():
    assert canonicalize("ftp://h.test/x") is None
    assert canonicalize("not a url") is None
    assert canonicalize("mailto:a@b.c") is None


def test_remove_dot_segments_rfc_cases():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"


def test_resolve():
    assert resolve("http://h.test/a/b", "../c") == "http://h.test/c"
    assert resolve("http://h.test/a/b", "/x") == "http://h.test/x"
    assert resolve("http://h.test/a/b", "http://o.test/z") == "http://o.test/z"


def test_sld_tld_naive_split():
    # /root/reference/util/util.go:92-101 — last two tokens, no PSL
    assert sld_tld("a.b.example.com") == "example.com"
    assert sld_tld("www.example.co.uk") == "co.uk"  # deliberately naive
    assert sld_tld("localhost") == "localhost"
    assert sld_tld("old.example.com") == "example.com"


def test_sld():
    assert sld("news.example.com") == "example"
    assert sld("localhost") == "localhost"


def test_resolve_fast_path_differential_fuzz():
    """The absolute-href fast path must be bit-identical to urljoin (incl.
    its ValueError → None cases) — fuzzed over the FSM's URL alphabet
    plus control characters and pathological scheme/netloc shapes."""
    import numpy as np
    from urllib.parse import urljoin

    from delver_spark.engine.urlnorm import resolve

    def resolve_naive(base, href):
        try:
            return urljoin(base, href)
        except ValueError:
            return None

    rng = np.random.default_rng(17)
    charset = list("ABCdefgh0129-._~:/?#[]@!$%&()*+,;= \\") + ["\t", "\n", "\r"]
    bases = ["http://a.test/x/y", "http://a.test",
             "https://www.a.test/p?q=1"]
    prefixes = ["http://", "https://", "HTTP://", "", "/", "../",
                "http:/", "http://h:70000/"]
    for _ in range(20000):
        body = "".join(rng.choice(charset, int(rng.integers(0, 40))))
        href = prefixes[int(rng.integers(0, len(prefixes)))] + body
        for b in bases:
            assert resolve(b, href) == resolve_naive(b, href), repr(href)
