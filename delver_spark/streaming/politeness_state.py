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


def politeness_admit(requests: DataFrame, rate_per_sec: float = 1.0,
                     burst: int = 4) -> DataFrame:
    """requests: streaming DataFrame with (host, url, priority,
    enqueue_round, enqueue_seq, event_ts:long). Returns the admitted
    sub-stream under the per-host token budget."""

    def bucket(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (host,) = key
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
                                 tokens + (now - last_ts) * rate_per_sec)
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
