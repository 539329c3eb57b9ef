"""news.go admission heuristics: the news_test.go golden (1-of-2 URLs
admitted), edge-case pins of every quirk, and Spark-column ≡ scalar-twin
consistency."""

import pytest
from pyspark.sql import functions as F

from delver_spark.functions.news import (
    BLACKLISTED_EXTENSIONS,
    BLACKLISTED_PATHS,
    news_url_allowed,
    url_allowed_py,
)

ORIGIN = "http://test.com/example"


def test_news_test_go_golden():
    """news_test.go:17-70: of the two proposed URLs, only the article
    link on the same host is admitted."""
    uris = ["http://test.com/article/this-is-a-test-article-today",
            "http://example.com"]
    admitted = [u for u in uris if url_allowed_py(u, ORIGIN)]
    assert admitted == ["http://test.com/article/this-is-a-test-article-today"]


@pytest.mark.parametrize("url,want", [
    # exact-host gate (news.go:229-231): subdomain is NOT the same host
    ("http://www.test.com/article/x", False),
    # extension blacklist on the path (news.go:234-236)
    ("http://test.com/article/pic.jpg", False),
    ("http://test.com/article/pic.jpg?x=1", False),  # query not part of Path
    # 'article' in the FIRST token bypasses everything else (news.go:279-281)
    ("http://test.com/articles/css", True),
    ("http://test.com/myarticle/a", True),
    # all tokens <= 20 chars -> not an article (news.go:283-291)
    ("http://test.com/news/short", False),
    # one >20-char token is enough
    ("http://test.com/news/a-very-long-article-slug-here", True),
    # first-token SUBSTRING blacklist (util.go:49-57): 'stags' contains 'tag'
    ("http://test.com/stags/a-very-long-article-slug-here", False),
    ("http://test.com/wp-content/a-very-long-article-slug-here", False),
    # ':' AND '=' in the path (news.go:254-256) — checked after
    # looksLikeArticle, so an article-prefixed path still fails it
    ("http://test.com/article/a:b=c", False),
    ("http://test.com/article/a:b-c", True),   # ':' alone is fine
    # empty path -> no tokens -> False (news.go:276-278)
    ("http://test.com", False),
])
def test_url_allowed_edge_cases(url, want):
    assert url_allowed_py(url, ORIGIN) is want


def test_blacklists_match_reference_counts():
    """news.go:22-58 lists 35 extensions; :60-76 lists 15 path entries."""
    assert len(BLACKLISTED_EXTENSIONS) == 35
    assert len(BLACKLISTED_PATHS) == 15


def test_column_expression_matches_scalar_twin(spark):
    """The Catalyst predicate and the scalar twin agree on every edge
    case above plus the golden pair."""
    from urllib.parse import urlsplit

    urls = [ORIGIN,
            "http://test.com/article/this-is-a-test-article-today",
            "http://example.com"] + [
        u for u, _ in [
            ("http://www.test.com/article/x", 0),
            ("http://test.com/article/pic.jpg", 0),
            ("http://test.com/articles/css", 0),
            ("http://test.com/myarticle/a", 0),
            ("http://test.com/news/short", 0),
            ("http://test.com/news/a-very-long-article-slug-here", 0),
            ("http://test.com/stags/a-very-long-article-slug-here", 0),
            ("http://test.com/article/a:b=c", 0),
            ("http://test.com/article/a:b-c", 0),
            ("http://test.com", 0),
        ]]
    rows = [(u, urlsplit(u).path, urlsplit(u).netloc,
             urlsplit(ORIGIN).netloc) for u in urls]
    df = spark.createDataFrame(
        rows, "url string, path string, host string, origin_host string")
    got = {r["url"]: r["ok"] for r in df.select(
        "url", news_url_allowed(F.col("path"), F.col("host"),
                                F.col("origin_host")).alias("ok")).collect()}
    for u in urls:
        assert got[u] == url_allowed_py(u, ORIGIN), u


def test_f8_query_exercises_both_branches(spark):
    """The driver query admits some and rejects some synthesized URLs."""
    import __spark_entry__ as e

    out = e.queries()["f8_news_admission"](spark, "/root/testdata/sf0.001") \
        .toPandas()
    assert out["admitted"].any() and (~out["admitted"]).any()
