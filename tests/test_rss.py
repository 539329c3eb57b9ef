"""RSS source (SURVEY S2): item links -> FetcherRequest rows at depth 1,
first-occurrence dedupe per feed, allow-on-parse-failure semantics."""

FEED = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>t</title><link>http://feed.test/</link>
  <item><title>a</title><link>http://news.test/A</link></item>
  <item><title>b</title><link> http://news.test/b </link></item>
  <item><title>dup</title><link>http://news.test/A</link></item>
  <item><title>rel-less</title></item>
</channel></rss>"""

BROKEN = "<rss><channel><item><link>http://x.test/a</link>"


def test_rss_requests(spark):
    from delver_spark.sources.rss import rss_requests

    feeds = spark.createDataFrame(
        [("http://feed.test/rss", FEED), ("http://bad.test/rss", BROKEN)],
        "feed_url string, body string")
    rows = rss_requests(feeds).orderBy("url").collect()
    # broken feed contributes nothing (reference skips on parse error);
    # dup item deduped; channel-level <link> not an item link
    assert [(r["url"], r["host"], r["origin"], r["depth"], r["protocol"])
            for r in rows] == [
        ("http://news.test/A", "news.test", "http://feed.test/rss", 1, "HTTP"),
        ("http://news.test/b", "news.test", "http://feed.test/rss", 1, "HTTP"),
    ]
