"""FilterParams → Column compiler: the reference's query surface
(types/rpc/filter.go:7-46) compiled to Catalyst expressions instead of
Elasticsearch DSL (filter/search_composite.go:52-155,
filter/stream_composite.go:47-246, filter/search_metric.go:42-128).

Parse → analyze → optimize → execute is all Catalyst; this module only
builds the expression tree (SURVEY §3.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# filter/constants.go:5-12 — default projected fields, mapped to engine
# document columns (uri→url_canon; timestamp→seq-based fetch stamp)
DEFAULT_FIELDS = ["url_canon", "host", "http_code", "timestamp", "title"]
SEARCH_LIMIT = 10000          # filter/constants.go:14-26
DEFAULT_DAYS_LOOKBACK = 90    # filter/constants.go
METRIC_MAX_LOOKBACK_S = 90 * 24 * 3600  # filter/search_metric.go:49-57


@dataclass
class CompositeFilterQuery:
    keyword: list[str] = field(default_factory=list)
    country: list[str] = field(default_factory=list)
    company: list[str] = field(default_factory=list)
    url: list[str] = field(default_factory=list)
    domain: list[str] = field(default_factory=list)
    http_code: list[int] = field(default_factory=list)
    title: list[str] = field(default_factory=list)
    language: list[str] = field(default_factory=list)


@dataclass
class MetricFilterQuery:
    key: str = ""
    start: int = 0
    end: int = 0


@dataclass
class Aggregator:
    name: str = ""               # "sum" | "mean"  (util/aggregator.go:103-138)
    time_field: str = "timestamp"
    agg_field: str = "value"
    time_window_seconds: int = 60


@dataclass
class FilterParams:
    fields: list[str] = field(default_factory=list)
    range_days: int = 0
    data_type: str = "composite"
    query: CompositeFilterQuery | MetricFilterQuery | None = None
    agg: Aggregator | None = None


def filter_params_from_json(doc: dict) -> FilterParams:
    """Parse a filter document with the reference's exact JSON field
    names (types/rpc/filter.go:8-41: ``fields``/``range``/``data_type``/
    ``query``/``agg`` with ``agg_name``/``time_field``/``agg_field``/
    ``time_window_seconds``; the query payload dispatches on
    ``data_type`` — composite vs metric, filter.go:5-6). This is the
    wire format clients register filters with (gateway + api), so with
    it the QUERY surface is config data too, like the application
    assembly in delver_spark/config.py."""
    data_type = doc.get("data_type", "composite")
    raw = doc.get("query") or {}
    query: CompositeFilterQuery | MetricFilterQuery
    # `or`-defaults throughout: JSON null unmarshals to the zero value in
    # the reference (Go), so an explicit null must not raise here
    if data_type == "metric":
        query = MetricFilterQuery(key=raw.get("key") or "",
                                  start=int(raw.get("start") or 0),
                                  end=int(raw.get("end") or 0))
    elif data_type == "composite":
        query = CompositeFilterQuery(
            keyword=list(raw.get("keyword") or []),
            country=list(raw.get("country") or []),
            company=list(raw.get("company") or []),
            url=list(raw.get("url") or []),
            domain=list(raw.get("domain") or []),
            http_code=[int(x) for x in (raw.get("http_code") or [])],
            title=list(raw.get("title") or []),
            language=list(raw.get("language") or []))
    else:
        raise ValueError(f"unknown filter data_type {data_type!r}")
    agg = None
    if doc.get("agg"):
        a = doc["agg"]

        # Go zero-value fidelity (ADVICE r3): an EXPLICIT JSON null
        # unmarshals to the zero value (0 / ""), exactly as Go's
        # encoding/json leaves the field; the dataclass defaults apply
        # only when the key is absent from the wire document.
        def _g(key, zero, default):
            if key not in a:
                return default
            v = a[key]
            return zero if v is None else v

        agg = Aggregator(name=_g("agg_name", "", ""),
                         time_field=_g("time_field", "", "timestamp"),
                         agg_field=_g("agg_field", "", "value"),
                         time_window_seconds=int(
                             _g("time_window_seconds", 0, 60)))
    return FilterParams(fields=list(doc.get("fields") or []),
                        range_days=int(doc.get("range") or 0),
                        data_type=data_type, query=query, agg=agg)


def compile_composite(q: CompositeFilterQuery, now_ts: int,
                      range_days: int = 0):
    """Conjunctive predicate. Faithful quirks: every list entry appends its
    own must-clause (so multiple http_codes AND together,
    search_composite.go:85-90); keyword matches title OR text."""
    days = range_days or DEFAULT_DAYS_LOOKBACK
    cond = F.col("timestamp") >= F.lit(now_ts - days * 86400)
    for kw in q.keyword:
        cond &= (F.coalesce(F.col("title"), F.lit("")).contains(kw)
                 | F.coalesce(F.col("text"), F.lit("")).contains(kw))
    for c in q.country:
        cond &= F.array_contains(F.col("countries"), c)
    for c in q.company:
        cond &= F.array_contains(F.col("companies"), c)
    for v in q.url:
        cond &= F.col("url_canon") == v
    for v in q.domain:
        cond &= F.col("domain") == v
    for v in q.http_code:
        cond &= F.col("http_code") == v
    for v in q.title:
        cond &= F.coalesce(F.col("title"), F.lit("")).contains(v)
    for v in q.language:
        cond &= F.col("lang") == v
    return cond


def search_composite(docs: DataFrame, params: FilterParams, now_ts: int) -> DataFrame:
    """Historical search: filter → project → timestamp asc cap 10000
    (SURVEY §3.3, O3)."""
    q = params.query or CompositeFilterQuery()
    fields = params.fields or DEFAULT_FIELDS
    return (docs.filter(compile_composite(q, now_ts, params.range_days))
            .select(*fields)
            .orderBy("timestamp", "url_canon")
            .limit(SEARCH_LIMIT))


def search_metric(metrics: DataFrame, params: FilterParams) -> DataFrame:
    """Metric query: key match + time range (90-day cap, hard error beyond)
    + optional date-histogram rollup (A1)."""
    q = params.query
    assert isinstance(q, MetricFilterQuery)
    if q.end - q.start > METRIC_MAX_LOOKBACK_S:
        raise ValueError("metric query range exceeds 90-day lookback cap "
                         "(filter/search_metric.go:49-57)")
    out = metrics.filter((F.col("key") == q.key)
                         & (F.col("when") >= q.start)
                         & (F.col("when") < q.end))
    agg = params.agg
    if agg is None:
        return out.orderBy("when", "key")
    bucket = (F.floor(F.col("when") / agg.time_window_seconds)
              * agg.time_window_seconds).alias("bucket_start")
    if agg.name == "sum":
        a = F.sum("value").alias("value")
    elif agg.name == "mean":
        a = F.avg("value").alias("value")
    else:
        raise ValueError(f"unsupported aggregator {agg.name!r} "
                         "(util/aggregator.go:103-138 defines sum/mean)")
    return (out.groupBy(bucket)
            .agg(a, F.min("when").alias("min_when"))
            .orderBy("bucket_start"))
