"""Stateful streaming politeness: per-host crawl-delay token bucket as an
``applyInPandasWithState`` operator (SURVEY O2/T6; the batch engine applies
the same budget via the dequeue window — this is its streaming twin for a
continuously-arriving request stream).

Semantics per host group and micro-batch: the bucket refills at
``rate_per_sec`` up to ``burst``; requests are admitted in
(priority, enqueue_round, enqueue_seq) order while tokens last, the rest
are dropped (a real deployment would loop them back to the frontier).
State per host is two numbers — (tokens, last_refill_ts) — bounded and
watermark-free, exactly the shape GroupState is for. At 10^10 scale the
stream is partitioned by host hash, so state shards horizontally with
the executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

ORDER_COLS = ["priority", "enqueue_round", "enqueue_seq"]

ADMITTED_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("enqueue_seq", T.LongType(), False),
    T.StructField("admitted_at", T.LongType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("tokens", T.DoubleType(), False),
    T.StructField("last_ts", T.LongType(), False),
])


def rates_from_robots(robots_bodies: dict, default_rate: float = 1.0,
                      max_rate: float | None = None) -> dict:
    """Per-host refill rates from robots.txt ``Crawl-delay`` directives
    (engine/robots.py:crawl_delay — the north star's "crawl-delay
    tokens"): rate = 1/delay for hosts that declare one, clamped to
    ``max_rate`` (never crawl FASTER than the default just because a
    delay is tiny — pass max_rate=default_rate for that policy).
    Hosts without a delay are omitted (they fall back to the bucket's
    ``rate_per_sec``)."""
    from ..engine.robots import crawl_delay

    rates = {}
    for host, body in robots_bodies.items():
        d = crawl_delay(body)
        if d is not None:
            r = 1.0 / d
            rates[host] = min(r, max_rate) if max_rate is not None else r
    return rates


def politeness_admit(requests: DataFrame, rate_per_sec: float = 1.0,
                     burst: int = 4,
                     rate_by_host: dict | None = None) -> DataFrame:
    """requests: streaming DataFrame with (host, url, priority,
    enqueue_round, enqueue_seq, event_ts:long). Returns the admitted
    sub-stream under the per-host token budget.

    ``rate_by_host`` overrides the refill rate for specific hosts
    (build it with :func:`rates_from_robots` to honor robots.txt
    Crawl-delay). The dict ships in the task closure — fine for the
    robots-cache-sized host sets the crawl keeps anyway; a host set
    too big for a broadcast would instead join a ``rate`` column onto
    the stream and read it per group (same bucket arithmetic)."""
    rate_by_host = rate_by_host or {}

    def bucket(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (host,) = key
        rate = rate_by_host.get(host, rate_per_sec)
        if state.exists:
            tokens, last_ts = state.get
        else:
            tokens, last_ts = float(burst), 0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ORDER_COLS)
            for r in pdf.itertuples():
                now = int(r.event_ts)
                if now > last_ts:
                    tokens = min(float(burst),
                                 tokens + (now - last_ts) * rate)
                    last_ts = now
                if tokens >= 1.0:
                    tokens -= 1.0
                    out_rows.append((host, r.url, int(r.enqueue_seq), now))
        state.update((float(tokens), int(last_ts)))
        if out_rows:
            yield pd.DataFrame(out_rows,
                               columns=["host", "url", "enqueue_seq",
                                        "admitted_at"])

    return (requests.groupBy("host")
            .applyInPandasWithState(bucket, ADMITTED_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
