"""Stateful streaming politeness (applyInPandasWithState token bucket):
budget enforced within a micro-batch, state carried across micro-batches."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


_PA_SCHEMA = pa.schema([
    ("host", pa.string()), ("url", pa.string()),
    ("priority", pa.int32()), ("enqueue_round", pa.int32()),
    ("enqueue_seq", pa.int64()), ("event_ts", pa.int64())])


def _write(d, name, rows):
    tbl = pa.Table.from_pylist([
        {"host": h, "url": u, "priority": 0, "enqueue_round": 0,
         "enqueue_seq": s, "event_ts": ts} for (h, u, s, ts) in rows],
        schema=_PA_SCHEMA)
    pq.write_table(tbl, os.path.join(d, name))


def test_token_bucket_across_microbatches(spark, tmp_path):
    from pyspark.sql import types as T

    from delver_spark.streaming.politeness_state import politeness_admit

    d = str(tmp_path / "reqs")
    os.makedirs(d)
    # batch 1: three requests for h1 at t=100 (burst=2 -> two admitted),
    # plus one for h2
    _write(d, "b1.parquet", [
        ("h1.test", "http://h1.test/a", 0, 100),
        ("h1.test", "http://h1.test/b", 1, 100),
        ("h1.test", "http://h1.test/c", 2, 100),
        ("h2.test", "http://h2.test/x", 3, 100),
    ])
    time.sleep(1.1)  # distinct mtime => second micro-batch
    # batch 2: two more for h1 at t=101 — bucket refilled by exactly 1
    _write(d, "b2.parquet", [
        ("h1.test", "http://h1.test/d", 10, 101),
        ("h1.test", "http://h1.test/e", 11, 101),
    ])

    schema = T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("enqueue_round", T.IntegerType()),
        T.StructField("enqueue_seq", T.LongType()),
        T.StructField("event_ts", T.LongType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    admitted = politeness_admit(stream, rate_per_sec=1.0, burst=2)
    name = "politeness_admitted"
    q = (admitted.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["host"], r["enqueue_seq"])
           for r in spark.table(name).collect()}
    assert got == {("h1.test", 0), ("h1.test", 1), ("h2.test", 3),
                   ("h1.test", 10)}


def test_crawl_delay_parser_goldens():
    """Group semantics mirror parse_robots: only the '*' group applies;
    last directive in an applying group wins; malformed/negative/zero
    values and delays under OTHER agents are ignored."""
    from delver_spark.engine.robots import crawl_delay

    assert crawl_delay(None) is None
    assert crawl_delay("") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: 2") == 2.0
    assert crawl_delay("User-agent: *\nCrawl-delay: 0.5") == 0.5
    # other agent's delay does not apply
    assert crawl_delay("User-agent: foo\nCrawl-delay: 9") is None
    # group switch: the '*' group's value wins, not foo's
    assert crawl_delay("User-agent: foo\nCrawl-delay: 9\n"
                       "User-agent: *\nCrawl-delay: 3") == 3.0
    # last directive in the applying group wins
    assert crawl_delay("User-agent: *\nCrawl-delay: 3\n"
                       "Crawl-delay: 7") == 7.0
    # malformed / non-positive ignored
    assert crawl_delay("User-agent: *\nCrawl-delay: soon") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: -1") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: 0") is None
    # comments stripped; directives after a non-* group stop applying
    assert crawl_delay("User-agent: *  # all\nCrawl-delay: 4  # s\n"
                       "User-agent: bot\nCrawl-delay: 1") == 4.0
    # allow/disallow lines don't confuse the group tracking
    assert crawl_delay("User-agent: *\nDisallow: /x\n"
                       "Crawl-delay: 1.5\nAllow: /y") == 1.5


def test_rates_from_robots():
    from delver_spark.streaming.politeness_state import rates_from_robots

    bodies = {"slow.test": "User-agent: *\nCrawl-delay: 10",
              "fast.test": "User-agent: *\nCrawl-delay: 0.1",
              "plain.test": "User-agent: *\nDisallow: /private",
              "broken.test": None}
    r = rates_from_robots(bodies)
    assert r == {"slow.test": 0.1, "fast.test": 10.0}
    # max_rate clamp: a tiny delay must not raise the crawl rate
    r2 = rates_from_robots(bodies, max_rate=1.0)
    assert r2 == {"slow.test": 0.1, "fast.test": 1.0}


def test_token_bucket_per_host_rates(spark, tmp_path):
    """Two hosts, same request pattern, different robots Crawl-delay:
    the slow host's bucket refills at 1/delay and admits fewer."""
    from pyspark.sql import types as T

    from delver_spark.streaming.politeness_state import (
        politeness_admit, rates_from_robots)

    d = str(tmp_path / "reqs_rates")
    os.makedirs(d)
    # burst=1; at t=100 each host admits one. At t=102 the fast host
    # (delay 1 -> rate 1.0) has refilled >=1 token; the slow host
    # (delay 10 -> rate 0.1) has only 0.2 tokens and must drop.
    _write(d, "b1.parquet", [
        ("fast.test", "http://fast.test/a", 0, 100),
        ("slow.test", "http://slow.test/a", 1, 100),
        ("fast.test", "http://fast.test/b", 2, 102),
        ("slow.test", "http://slow.test/b", 3, 102),
    ])
    rates = rates_from_robots({
        "fast.test": "User-agent: *\nCrawl-delay: 1",
        "slow.test": "User-agent: *\nCrawl-delay: 10"})

    schema = T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("enqueue_round", T.IntegerType()),
        T.StructField("enqueue_seq", T.LongType()),
        T.StructField("event_ts", T.LongType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    admitted = politeness_admit(stream, rate_per_sec=1.0, burst=1,
                                rate_by_host=rates)
    name = "politeness_admitted_rates"
    q = (admitted.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["host"], r["enqueue_seq"])
           for r in spark.table(name).collect()}
    assert got == {("fast.test", 0), ("slow.test", 1), ("fast.test", 2)}
