"""Structured-Streaming layer: the reference's websocket stream-filter bank
(gateway/client_streamer.go:56-364) as streaming queries over the engine's
document/metric sinks.

  T1/T2: per-client conjunctive filters → one streaming query per filter
         over the documents directory (filter/stream_composite.go:47-246)
  T5   : client-side tumbling-window aggregation with a watermark
         (client_streamer.go:220-305 + util/aggregator.go:62-138)
  T4   : preload = the equivalent batch search unioned before the stream
         (client_streamer.go:161-197) — expressed here by running
         plans.query.search_composite on the same directory first.

The reference has no event-time reasoning (T7) — watermarks below exist
only to bound streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.query import CompositeFilterQuery, FilterParams, compile_composite

DOC_STREAM_SCHEMA = T.StructType([
    T.StructField("url_canon", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("domain", T.StringType()),
    T.StructField("http_code", T.IntegerType()),
    T.StructField("timestamp", T.LongType()),
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("countries", T.ArrayType(T.StringType())),
    T.StructField("companies", T.ArrayType(T.StringType())),
])


def document_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    return (spark.readStream.schema(DOC_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 16)
            .parquet(docs_dir))


def stream_composite_filter(stream: DataFrame, params: FilterParams,
                            now_ts: int) -> DataFrame:
    """T2: the same compiled conjunction as the batch search — one
    registered client filter."""
    q = params.query or CompositeFilterQuery()
    return stream.filter(compile_composite(q, now_ts, params.range_days))


def stream_windowed_agg(stream: DataFrame, window_seconds: int,
                        agg_name: str = "sum") -> DataFrame:
    """T5: tumbling event-time window over the filtered stream; watermark
    bounds state (reference caps lookback at 90 days)."""
    ts = F.to_timestamp(F.col("timestamp"))
    win = F.window(ts, f"{window_seconds} seconds")
    base = stream.withColumn("event_time", ts) \
        .withWatermark("event_time", "90 days")
    agg = (F.sum("http_code") if agg_name == "sum"
           else F.avg("http_code"))
    return (base.groupBy(win.alias("w"))
            .agg(agg.alias("value"), F.count("*").alias("n"))
            .select(F.unix_timestamp("w.start").alias("bucket_start"),
                    "value", "n"))


def stream_dedup(stream: DataFrame, key_col: str = "url_canon",
                 watermark: str = "90 days") -> DataFrame:
    """Streaming first-occurrence dedup on ``key_col`` — A4's streaming
    twin (util/util.go:23-37 over a live document stream). State is
    evicted past the watermark horizon (dropDuplicatesWithinWatermark),
    so memory is bounded by the horizon's key cardinality, not the
    stream's lifetime; the all-time seen-set remains the bloom (F7) —
    this operator is the within-horizon exact gate layered above it."""
    ts = F.to_timestamp(F.col("timestamp"))
    return (stream.withColumn("event_time", ts)
            .withWatermark("event_time", watermark)
            .dropDuplicatesWithinWatermark([key_col]))


def run_to_memory(filtered: DataFrame, name: str, spark: SparkSession,
                  output_mode: str = "append") -> DataFrame:
    """Drain the stream with an availableNow trigger into a memory sink
    (S9 websocket push analog) and return the materialized table."""
    q = (filtered.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)
