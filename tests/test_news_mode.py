"""News-mode crawl engine ≡ oracle: the reference's second accumulator
type (news.go) run END-TO-END — admission with per-outlink robots,
bloom marking of admitted urls only, no stash/refill, maxDepth=1,
articles = depth>0 fetched pages."""

import numpy as np
import pytest

from delver_spark.oracle.crawler import run_oracle


@pytest.fixture(scope="module")
def news_corpus(tmp_path_factory):
    from delver_spark.fixtures.gen import generate_corpus

    d = str(tmp_path_factory.mktemp("corpus_news"))
    generate_corpus(d, n_pages=200, n_hosts=10, seed=13, max_rounds=8,
                    path_style="news")
    return d


@pytest.fixture(scope="module")
def news_oracle(news_corpus):
    return run_oracle(news_corpus, mode="news")


@pytest.fixture(scope="module")
def news_engine(spark, news_corpus, news_oracle, tmp_path_factory):
    from delver_spark.operators.crawl import CrawlEngine

    wd = str(tmp_path_factory.mktemp("crawl_news"))
    eng = CrawlEngine(spark, news_corpus, wd, mode="news")
    eng.run()
    return eng


def test_news_mode_is_nonvacuous(news_oracle):
    # admissions happened (depth-1 fetches in later rounds) and articles
    # were emitted; some candidates were seen-blocked too
    assert news_oracle.rounds >= 2
    assert any(r["depth"] == 1 for r in news_oracle.crawl_order)
    assert len(news_oracle.documents) > 0
    assert all(doc["depth"] > 0 for doc in news_oracle.documents)


def test_news_crawl_order_matches_oracle(news_oracle, news_engine):
    oo = [(r["seq"], r["url_canon"], r["depth"], r["round"], r["success"])
          for r in news_oracle.crawl_order]
    df = news_engine.crawl_order_df()
    so = list(df[["seq", "url_canon", "depth", "round", "success"]]
              .itertuples(index=False, name=None))
    assert so == oo


def test_news_bloom_matches_oracle(news_oracle, news_engine):
    assert np.array_equal(news_oracle.bloom.bit_positions(),
                          news_engine.bloom.bit_positions())
    assert news_oracle.bloom.n == news_engine.bloom.n


def test_news_lineage_matches_oracle(news_oracle, news_engine):
    ol = [(r["round"], r["partition"], r["fetched"], r["deduped"],
           r["enqueued"], r["stashed"]) for r in news_oracle.lineage]
    df = news_engine.lineage_df()
    sl = list(df[["round", "partition", "fetched", "deduped", "enqueued",
                  "stashed"]].itertuples(index=False, name=None))
    assert ol == sl


def test_news_articles_match_oracle(news_oracle, news_engine):
    import pandas as pd
    import pyarrow.parquet as pq

    parts = news_engine.store.part_dirs("documents", news_engine.round)
    frames = [pq.read_table(p).to_pandas() for p in parts]
    if news_engine.documents:
        frames.append(pd.concat(news_engine.documents, ignore_index=True))
    docs = pd.concat(frames, ignore_index=True)
    got = sorted(zip(docs["url_canon"], docs["round"]))
    want = sorted((d["url_canon"], d["round"]) for d in news_oracle.documents)
    assert got == want
    assert (docs["depth"] > 0).all()


def test_rss_feeds_news_pipeline(spark, news_corpus, tmp_path_factory):
    """S2 -> news integration: the RSS publisher's FetcherRequests
    (depth 1) seed the news engine's frontier; one round fetches them
    all as articles (processArticle) and proposes nothing (depth >=
    maxDepth), leaving the frontier empty — the reference news pipeline's
    steady state."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from delver_spark.operators.crawl import CrawlEngine
    from delver_spark.operators.frontier import FRONTIER_SCHEMA
    from delver_spark.sources.rss import rss_requests

    pages = pq.read_table(os.path.join(news_corpus, "pages.parquet"),
                          columns=["url_canon"]).to_pylist()
    items = [r["url_canon"] for r in pages[:12]]
    feed = ("<?xml version='1.0'?><rss><channel>"
            + "".join(f"<item><link>{u}</link></item>" for u in items)
            + "</channel></rss>")
    feeds = spark.createDataFrame([("http://feed.test/rss", feed)],
                                  "feed_url string, body string")
    reqs = rss_requests(feeds)
    assert reqs.count() == len(set(items))

    wd = str(tmp_path_factory.mktemp("crawl_rss_news"))
    eng = CrawlEngine(spark, news_corpus, wd, mode="news")
    # publish the RSS requests as the frontier (depth 1, request order)
    rows = reqs.select(
        F.lit(0).alias("priority"), F.lit(0).alias("enqueue_round"),
        (F.monotonically_increasing_id()).alias("enqueue_seq"),
        "url", "host", F.col("depth").cast("int"),
        F.col("origin")).collect()
    eng.frontier = spark.createDataFrame(rows, FRONTIER_SCHEMA) \
        .localCheckpoint(eager=True)
    eng.frontier_count = len(rows)
    eng._base_count = len(rows)
    eng.seq = len(rows)
    eng.run()

    order = eng.crawl_order_df()
    assert sorted(order["url_canon"]) == sorted(set(items))
    assert eng.frontier_count == 0  # depth-1 pages propose nothing
    # every successfully fetched request became an article
    parts = eng.store.part_dirs("documents", eng.round)
    import pandas as pd
    frames = [pq.read_table(p).to_pandas() for p in parts]
    if eng.documents:
        frames.append(pd.concat(eng.documents, ignore_index=True))
    docs = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    fetched_ok = set(order[order["success"]]["url_canon"])
    assert set(docs["url_canon"]) == fetched_ok


def test_news_big_g_path_matches_oracle(spark, tmp_path_factory):
    """News admission through the BIG-G plan (direct payload scan,
    n_parts > 1 admission shuffle, distributed order artifacts) must
    stay bit-exact too."""
    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.operators.crawl import CrawlEngine

    d = str(tmp_path_factory.mktemp("corpus_news_bigg"))
    generate_corpus(d, n_pages=150, n_hosts=8, seed=17, max_rounds=5,
                    global_budget=20000, per_host_budget=50,
                    path_style="news")
    oracle = run_oracle(d, mode="news")
    assert any(r["depth"] == 1 for r in oracle.crawl_order)
    wd = str(tmp_path_factory.mktemp("crawl_news_bigg"))
    eng = CrawlEngine(spark, d, wd, mode="news")
    eng.run()
    df = eng.crawl_order_df()
    so = list(zip(df["seq"], df["url_canon"]))
    oo = [(r["seq"], r["url_canon"]) for r in oracle.crawl_order]
    assert so == oo
    assert np.array_equal(oracle.bloom.bit_positions(),
                          eng.bloom.bit_positions())


def test_news_resume_equals_uninterrupted(spark, news_corpus, news_oracle,
                                          tmp_path_factory):
    from delver_spark.operators.crawl import CrawlEngine

    wd = str(tmp_path_factory.mktemp("crawl_news_resume"))
    eng1 = CrawlEngine(spark, news_corpus, wd, mode="news")
    eng1.run(max_rounds=1)
    eng2 = CrawlEngine.resume(spark, news_corpus, wd)
    assert eng2.mode == "news"  # restored from the snapshot manifest
    eng2.run()
    df = eng2.crawl_order_df()
    so = list(zip(df["seq"], df["url_canon"]))
    oo = [(r["seq"], r["url_canon"]) for r in news_oracle.crawl_order]
    assert so == oo
