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
