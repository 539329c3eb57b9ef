"""RSS feed source (SURVEY S2, worker/publisher/rss_feed.go:31-90).

The reference's rss_feed publisher fetches each configured feed over the
network, parses it, and emits one FetcherRequest per item link at
depth 1. Graft-faithful form: the fetch is a table of (feed_url, body)
rows — network replaced by data, like the payload corpus — and the
parse+emit is one vectorized pass producing the same request rows the
reference enqueues (uri, host, origin=feed, depth=1, protocol HTTP;
types/message/fetcher_request.go:5-12).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..engine.urlnorm import canonicalize, host_of

REQUEST_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("host", T.StringType(), False),
    T.StructField("origin", T.StringType(), False),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("protocol", T.StringType(), False),
])


def _item_links(body: str) -> list[str]:
    """<item><link> texts in document order; malformed XML yields []
    (reference skips the feed on parse error, rss_feed.go:56-63)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return []
    return [el.text.strip() for el in root.iter("item")
            for el in el.iter("link") if el.text and el.text.strip()]


def rss_requests(feeds: DataFrame) -> DataFrame:
    """feeds(feed_url, body) -> FetcherRequest rows, one per item link,
    first-occurrence-deduped per feed, depth=1."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"url": [], "host": [], "origin": [], "depth": [],
                   "protocol": []}
            for feed_url, body in zip(pdf["feed_url"], pdf["body"]):
                seen = set()
                for raw in _item_links(body):
                    c = canonicalize(raw)
                    if c is None or c in seen:
                        continue
                    seen.add(c)
                    out["url"].append(c)
                    out["host"].append(host_of(c))
                    out["origin"].append(feed_url)
                    out["depth"].append(1)
                    out["protocol"].append("HTTP")
            yield pd.DataFrame(out)

    return feeds.mapInPandas(parse, REQUEST_SCHEMA)
