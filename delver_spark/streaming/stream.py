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


FEED_STREAM_SCHEMA = T.StructType([
    T.StructField("feed_url", T.StringType()),
    T.StructField("body", T.StringType()),
])


def news_article_stream(spark: SparkSession, feeds_dir: str,
                        corpus_dir: str, n_partitions: int = 8) -> DataFrame:
    """S2 → news as ONE Structured Streaming query: the reference's
    steady-state dataflow (rss_feed publisher → fetcher → extractor →
    news accumulator's processArticle, worker/publisher/rss_feed.go +
    news.go:160-190) without the round-loop translation.

    Feed files (feed_url, body) arriving under ``feeds_dir`` are
    micro-batched by the file source; each batch runs the SAME vectorized
    stages as the batch engine — rss_requests parse (depth-1
    FetcherRequests), payload fetch as a stream⋈static join against the
    corpus table, and the one-pass mapInArrow extractor — then keeps
    articles exactly as processArticle does: successful, non-quarantined,
    depth > 0 fetches. (Deployment note: per-micro-batch payload lookup
    at 100 TB should go through foreachBatch + the engine's
    broadcast-keys-into-the-scan fetch, sources/payload_scan.py, so
    payload bytes never shuffle; the inline join here is the
    demo/corpus-scale form of the same dataflow.)
    Output equality with the batch news engine on the same feeds is
    pinned by tests/test_query_stream.py::test_news_stream_equals_batch.

    At scale this is the production shape: the RSS poller appends feed
    snapshots to a directory/queue, and articles flow to the sink with
    per-micro-batch latency instead of per-round. Cross-batch repeat
    fetches are NOT suppressed here (the batch engine fetches every
    frontier row too); compose with stream_dedup for a within-horizon
    exact gate."""
    from ..operators.extract import EXTRACT_SCHEMA, make_extractor_arrow
    from ..sources.rss import rss_requests

    feeds = (spark.readStream.schema(FEED_STREAM_SCHEMA)
             .option("maxFilesPerTrigger", 1).parquet(feeds_dir))
    reqs = rss_requests(feeds)
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet") \
        .select("url_canon", "bytes", "fmt", "caption", "phash", "pix_md5")
    fetched = (reqs.join(pages, reqs.url == pages.url_canon, "left")
               .select(F.lit(0).cast("long").alias("pos"),
                       reqs.url.alias("url_canon"), reqs.depth,
                       reqs.host, "bytes", "fmt", "caption", "phash",
                       "pix_md5"))
    extracted = fetched.mapInArrow(
        make_extractor_arrow(n_partitions), EXTRACT_SCHEMA)
    return (extracted
            .filter(F.col("success") & F.col("quarantined").isNull()
                    & (F.col("depth") > 0))
            .select("url_canon", "host", "domain", "http_code", "title",
                    "text", "text_len", "lang", "partition_id"))


def run_to_memory(filtered: DataFrame, name: str, spark: SparkSession,
                  output_mode: str = "append") -> DataFrame:
    """Drain the stream with an availableNow trigger into a memory sink
    (S9 websocket push analog) and return the materialized table."""
    q = (filtered.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def stream_image_curation(stream: DataFrame,
                          watermark: str = "30 days",
                          ts_col: str = "ingest_time",
                          **gate_kwargs) -> DataFrame:
    """Streaming twin of multimodal.curate_image_caption over a live
    (image_id, w, h, caption, phash, <ts_col>) metadata stream — the
    image-axis analog of stream_dedup: the LAION metadata gates are
    stateless per-row expressions (the literal SAME Column via
    multimodal.curation_gate, so batch and stream cannot drift), and
    the phash dedup becomes FIRST-SEEN-within-watermark
    (dropDuplicatesWithinWatermark over gate-passing rows only — a
    failing row still can't shadow a later passing one).

    Semantics divergence, deliberate and documented: the batch
    operator's keeper is max-pixels-then-min-id over the WHOLE group,
    which a stream cannot see; the streaming keeper is arrival order
    ACROSS micro-batches with horizon-bounded state (same note as
    stream_dedup vs A4) — among duplicates landing in the SAME
    micro-batch, Spark keeps an arbitrary one (verified empirically:
    not necessarily the earliest event_time).
    tests/test_query_stream.py pins batch == stream when first arrival
    IS the max-pixels keeper, and first-seen-wins when it is not.

    Returns the curated stream (gate-passing, first-seen rows); per-row
    drop_reason observability is the batch operator's job."""
    from ..operators.multimodal import curation_gate

    ts = F.to_timestamp(F.col(ts_col))
    return (stream
            .filter(curation_gate(**gate_kwargs).isNull())
            .withColumn("event_time", ts)
            .withWatermark("event_time", watermark)
            .dropDuplicatesWithinWatermark(["phash"]))
