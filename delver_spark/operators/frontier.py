"""Frontier primitives: politeness dequeue, bloom probe/merge, robots gate.

Scale notes (10^10-row frontier, SURVEY §4.2):
  - dequeue is per-host ranking (distributed window over the host-hash
    partitioning) followed by a global top-G, which Spark executes as
    TakeOrdered (per-partition top-G, then merge of G-row heaps) — no
    single-partition global sort ever touches the full frontier;
  - the bloom is built per-partition in numpy and OR-merged with
    ``treeAggregate(depth=2)`` (BASELINE.json names this topology), then
    broadcast for the next round's membership probes;
  - the politeness budget is applied BEFORE any salting (it is a semantic
    limit, not an optimization — SURVEY §4.2.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..engine.bloom import BloomFilter
from ..engine.robots import allowed_batch
from ..engine.urlnorm import path_of

FRONTIER_SCHEMA = T.StructType([
    T.StructField("priority", T.IntegerType(), False),
    T.StructField("enqueue_round", T.IntegerType(), False),
    T.StructField("enqueue_seq", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("host", T.StringType(), False),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("origin", T.StringType(), True),
])

STORE_SCHEMA = T.StructType([
    T.StructField("domain", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("origin", T.StringType(), True),
    T.StructField("stash_key", T.LongType(), False),
])

ORDER_COLS = ["priority", "enqueue_round", "enqueue_seq"]


def budgets_from_crawl_delay(robots_bodies: dict, round_period_s: float,
                             per_host_budget: int) -> dict:
    """Per-round host budgets from robots.txt ``Crawl-delay``
    (engine/robots.py:crawl_delay): budget = floor(period/delay)
    clamped to [0, per_host_budget]. floor, not ceil — a delay longer
    than the round period honestly yields 0 fetches this round (the
    polite reading); sub-round token carry-over across rounds is the
    streaming operator's job (politeness_state.py), not the batch
    window's. Hosts without a delay are omitted (they get the default
    budget). Feed the result to :func:`dequeue`'s ``host_budgets``."""
    from ..engine.robots import crawl_delay

    out = {}
    for host, body in robots_bodies.items():
        d = crawl_delay(body)
        if d is not None:
            out[host] = max(0, min(per_host_budget,
                                   int(round_period_s / d)))
    return out


def dequeue(frontier: DataFrame, per_host_budget: int, global_budget: int,
            hot_host_threshold: int | None = None,
            n_salts: int = 64,
            seq_hint: int | None = None,
            big_path_floor: int = 10000,
            out_stats: dict | None = None,
            host_budgets: dict | None = None) -> DataFrame:
    """Greedy dequeue under per-host + global budgets in
    (priority, enqueue_round, enqueue_seq) order — provably equal to the
    oracle's sequential greedy (first-B-per-host ∩ global-top-G).
    Returns the batch with a 0-based ``pos`` column in global order.

    Skew safety at 10^10 rows: the per-host ranking window shuffles every
    row of a host into one task, so a 10^8-row hot host would be one
    straggler task. With ``hot_host_threshold`` set, hosts above it are
    first cut by a SALTED two-phase ranking — per-(host, salt) top-B is a
    superset of per-host top-B, so ranking each salt shard and keeping B
    leaves <= n_salts x B exact candidates per hot host for the final
    window. All JVM (two shuffles over the hot rows only; the cold path
    is untouched). Python-side pruning was measured and rejected: ANY
    python pass pays the full-frontier Arrow IPC round trip, which costs
    more than the JVM window shuffle it would save (10 s vs 2.8 s at
    10^7 rows — see bench_frontier.py).

    Big-round fast paths (exact, opt-in via ``seq_hint``):

    - ``per_host_budget >= global_budget`` → the host window is a provable
      no-op on the result: a row with host_rank > G in the top-G would
      need > G earlier same-host rows, all globally earlier, i.e. > G
      rows in the top-G — contradiction. The full-frontier host shuffle
      is skipped entirely.
    - ``seq_hint`` (the engine's global seq counter) asserts the CALLER'S
      invariant that frontier order collapses to enqueue_seq alone:
      every row has the same priority and enqueue_round is monotone
      non-decreasing in enqueue_seq (true by construction for the crawl
      engine — one global counter assigns both). Then for
      ``global_budget > big_path_floor`` the batch is selected by the
      DISTRIBUTED exact ranking (assign_global_rank sharded on
      floor(seq/chunk)) instead of TakeOrdered's single-point merge +
      single-partition pos window — the two core-count-independent
      ~1.5 s/round costs of the sustained drain (profile_round.py r4).
      Equality with the plain path is pinned by
      tests/test_frontier_ops.py::test_dequeue_big_path_exact_equal.
    ``out_stats``, if given, receives ``batch_count`` when the big path
    runs (derived from the ranking's own counts — saves the caller's
    count job).

    ``host_budgets`` (opt-in): per-host budget OVERRIDES, e.g. from
    :func:`budgets_from_crawl_delay` — host h's cap becomes
    host_budgets.get(h, per_host_budget); a 0 budget blocks the host
    this round. The dict is driver-resident by the same contract as
    the robots cache it derives from (one entry per known host) and
    reaches the plan as a broadcast-joined column, so the window stays
    one shuffle. The B>=G window skip and the hot-host pre-cut both
    account for overrides (the skip needs min(budget) >= G; the salted
    pre-cut keeps each hot host's OWN budget per salt — still an exact
    superset of its final top-budget)."""
    budgets_df = None
    min_budget = per_host_budget
    if host_budgets:
        spark = frontier.sparkSession
        budgets_df = F.broadcast(spark.createDataFrame(
            [(h, int(b)) for h, b in host_budgets.items()],
            "host string, _budget int"))
        min_budget = min(per_host_budget, min(host_budgets.values()))

    def _with_budget(df: DataFrame) -> DataFrame:
        # USING-join reorders columns (key first): reselect the caller's
        # order so dequeue's output schema is budget-path-invariant
        return (df.join(budgets_df, "host", "left")
                .withColumn("_budget", F.coalesce(
                    F.col("_budget"), F.lit(per_host_budget)))
                .select(*df.columns, "_budget"))

    if hot_host_threshold and min_budget < global_budget:
        # (with B >= G the host window below is skipped entirely, so the
        # hot-host pre-cut has nothing to relieve)
        cnt = frontier.groupBy("host").agg(F.count("*").alias("c"))
        hot_hosts = [r["host"] for r in
                     cnt.filter(F.col("c") > hot_host_threshold)
                     .select("host").collect()]
        if hot_hosts:
            is_hot = F.col("host").isin(hot_hosts)
            w_salt = Window.partitionBy("host", "_salt") \
                .orderBy(*[F.col(c) for c in ORDER_COLS])
            hot_rows = frontier.filter(is_hot)
            if budgets_df is not None:
                hot_rows = _with_budget(hot_rows)
                cap = F.col("_budget")
            else:
                cap = F.lit(per_host_budget)
            pruned_hot = (hot_rows
                          .withColumn("_salt", F.pmod(
                              F.hash("enqueue_seq"), F.lit(n_salts)))
                          .withColumn("_r", F.row_number().over(w_salt))
                          .filter(F.col("_r") <= cap)
                          .drop("_r", "_salt"))
            if budgets_df is not None:
                pruned_hot = pruned_hot.drop("_budget")
            frontier = frontier.filter(~is_hot).unionByName(pruned_hot)
    if min_budget >= global_budget:
        eligible = frontier  # host window provably no-op (see docstring)
    else:
        w_host = Window.partitionBy("host") \
            .orderBy(*[F.col(c) for c in ORDER_COLS])
        ranked_rows = frontier
        if budgets_df is not None:
            ranked_rows = _with_budget(ranked_rows)
            cap = F.col("_budget")
        else:
            cap = F.lit(per_host_budget)
        eligible = (ranked_rows
                    .withColumn("host_rank", F.row_number().over(w_host))
                    .filter(F.col("host_rank") <= cap)
                    .drop("host_rank"))
        if budgets_df is not None:
            eligible = eligible.drop("_budget")
    if seq_hint is not None and global_budget > big_path_floor:
        spark = frontier.sparkSession
        parts = max(spark.sparkContext.defaultParallelism, 4)
        chunk = max(1, (seq_hint + parts - 1) // parts)
        rank_stats: dict = {}
        ranked = assign_global_rank(
            eligible, ORDER_COLS,
            F.floor(F.col("enqueue_seq") / F.lit(chunk)), "pos",
            partitions=parts, out_stats=rank_stats)
        if out_stats is not None:
            out_stats["batch_count"] = min(global_budget,
                                           rank_stats["total"])
        return ranked.filter(F.col("pos") < global_budget)
    batch = eligible.orderBy(*ORDER_COLS).limit(global_budget)
    # pos over <= G rows: single-partition window is bounded by the budget
    w_pos = Window.orderBy(*[F.col(c) for c in ORDER_COLS])
    return batch.withColumn("pos", F.row_number().over(w_pos) - 1)


def make_bloom_probe(spark: SparkSession, bloom: BloomFilter):
    """Vectorized membership probe against a broadcast of the current
    bloom bitmap (SURVEY J3). Returns (udf, broadcast_handle)."""
    bc = spark.sparkContext.broadcast(bloom.to_bytes())

    @pandas_udf("boolean")
    def probe(urls: pd.Series) -> pd.Series:
        from ..engine.rolling_bloom import blooms_from_bytes
        out = None
        for bf in blooms_from_bytes(bc.value):
            hit = bf.contains_batch(urls.tolist())
            out = hit if out is None else (out | hit)
        return pd.Series(out)

    return probe, bc


def bloom_bits_for_urls(urls_df: DataFrame, max_n: int, p: float,
                        partitions: int | None = None) -> np.ndarray:
    """Per-partition numpy bitsets OR-merged via treeAggregate(depth=2)
    (SURVEY §4.2.3). ``urls_df`` must have a single string column.

    The per-partition bitset is built inside mapInPandas (Arrow transfer,
    no per-row pickling); only the P partition bitsets flow through the
    RDD treeAggregate."""
    proto = BloomFilter(max_n, p)
    nwords = len(proto.words)
    if partitions is not None:
        # callers that know the url count bound the number of bitsets
        # (each is m/8 bytes through the treeAggregate) — small rounds
        # want ONE bitset, not one per scan partition
        urls_df = urls_df.coalesce(max(1, partitions))

    def build(it):
        import pyarrow as pa

        local = BloomFilter(max_n, p)
        any_rows = False
        for rb in it:
            arr = rb.column(0)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if len(arr) == 0:
                continue
            any_rows = True
            # hash straight from the Arrow string buffers — zero python
            # string objects for the whole batch
            bufs = arr.buffers()
            offsets = np.frombuffer(bufs[1], dtype=np.int32,
                                    count=len(arr) + 1 + arr.offset)[arr.offset:]
            data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0]:offsets[-1]]
            lens = np.diff(offsets).astype(np.int64)
            local._set_positions(local.probes_batch_buf(data, lens))
        if any_rows:
            yield pa.RecordBatch.from_arrays(
                [pa.array([local.words.tobytes()], type=pa.binary())],
                names=["words"])

    bitsets = urls_df.mapInArrow(build, "words binary")
    rdd = bitsets.rdd.map(lambda r: np.frombuffer(r[0], dtype=np.uint64))
    zero = np.zeros(nwords, dtype=np.uint64)
    return rdd.treeAggregate(zero, lambda a, b: a | b, lambda a, b: a | b, depth=2)


def cuckoo_pairs_for_urls(urls_df: DataFrame, shards: int, m: int,
                          partitions: int | None = None) -> np.ndarray:
    """Cuckoo-mode twin of :func:`bloom_bits_for_urls`: hash the single
    string column zero-copy on the executors and derive the seen-set's
    (shard, i1, fp) rows there — only the 24-byte numeric rows reach the
    driver (no python strings ever materialize), where
    ``ShardedCuckoo.add_pairs_canonical`` applies them. Unlike bloom
    bitsets, cuckoo inserts can't OR-merge, so the rows themselves are
    the minimal transferable round state. Returns an (n, 3) int64 array;
    i1 < m and fp <= 0xFFFF make the int64 view lossless."""
    import pyarrow as pa

    from ..engine.cuckoo import _derive, shard_of
    from ..engine.murmur import hash128_batch_buf

    if partitions is not None:
        urls_df = urls_df.coalesce(max(1, partitions))

    def derive_pass(it):
        for rb in it:
            arr = rb.column(0)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if len(arr) == 0:
                continue
            from ..engine.murmur import string_buf_views
            h1, h2 = hash128_batch_buf(*string_buf_views(arr))
            i1, fp = _derive(h1, h2, m)
            yield pa.RecordBatch.from_arrays(
                [pa.array(shard_of(h2, shards).view(np.int64)),
                 pa.array(i1.view(np.int64)),
                 pa.array(fp.view(np.int64))],
                names=["shard", "i1", "fp"])

    tbl = (urls_df.mapInArrow(derive_pass, "shard long, i1 long, fp long")
           .toArrow())
    return np.stack([tbl.column(c).to_numpy(zero_copy_only=False)
                     for c in ("shard", "i1", "fp")], axis=1)


_SENTINEL = np.int64(1 << 62)


def _seen_mask(seen, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Seen-set membership from murmur halves — a single BloomFilter, a
    generation LIST (rolling bloom, any-match read per
    rolling_bloom.go:203-213: all generations share (max_n, p) hence m
    and the probe positions, so membership is an OR of the per-generation
    bit tests over one shared position array), or any filter exposing
    ``contains_batch_hashed`` (the cuckoo seen-set,
    engine/cuckoo.py)."""
    if hasattr(seen, "contains_batch_hashed"):
        return seen.contains_batch_hashed(h1, h2)
    blooms = seen if isinstance(seen, list) else [seen]
    pos = blooms[0]._probes_from_hash(h1, h2)
    widx = (pos >> np.uint64(6)).astype(np.int64)
    shift = pos & np.uint64(63)
    out = np.zeros(len(h1), dtype=bool)
    for bf in blooms:
        bits = (bf.words[widx] >> shift) & np.uint64(1)
        out |= bits.all(axis=1)
    return out


def admission_keep_mask(h1: np.ndarray, h2: np.ndarray,
                        page_pos: np.ndarray, f_pos: np.ndarray,
                        is_marker: np.ndarray,
                        bloom) -> np.ndarray:
    """Vectorized winner selection for the fused admission pass
    (crawl.py): rows are candidate proposals and fetched-url marker rows
    colocated by url. Returns the boolean keep mask (True = admitted
    candidate row).

    Gates (sequential-oracle equivalence, dfs_basic.go:61-123): admit a
    candidate iff (a) its url is not in the previous round's bloom,
    (b) no marker for the url has position <= the proposing page's, and
    (c) the proposal comes from the FIRST page proposing the url (all
    same-page duplicates of that page win — reference quirk).

    Grouping key is the url's murmur3 x64_128 (h1, h2) — NOT the string.
    The bloom's probe positions derive solely from (h1, h2)
    (bloom.go:212-226), so two urls colliding in all 128 bits are already
    indistinguishable to the seen-set in the reference itself; using the
    hash as the group key adds no new collision class in practice
    (P ~ n^2 / 2^129) and lets the whole pass run without materializing
    a single python string.

    ``bloom`` may be anything :func:`_seen_mask` accepts — a single
    BloomFilter, a rolling-bloom generation list, or the cuckoo
    seen-set; the gate semantics are filter-agnostic."""
    n = len(h1)
    idx = np.lexsort((h2, h1))
    h1s, h2s = h1[idx], h2[idx]
    new_run = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
    run_starts = np.flatnonzero(new_run)
    run_id_sorted = np.cumsum(new_run) - 1
    run_id = np.empty(n, dtype=np.int64)
    run_id[idx] = run_id_sorted

    # per-run min marker position (sentinel when the run has no marker)
    fm = np.where(is_marker, f_pos, _SENTINEL)
    run_fp_min = np.minimum.reduceat(fm[idx], run_starts)

    # gate (a): seen-set membership straight from the hashes
    in_bloom = _seen_mask(bloom, h1, h2)

    elig = (~is_marker) & (~in_bloom) & (run_fp_min[run_id] > page_pos)

    # gate (c): min proposing page among eligible proposals of the run
    pp = np.where(elig, page_pos, _SENTINEL)
    run_pp_min = np.minimum.reduceat(pp[idx], run_starts)
    return elig & (page_pos == run_pp_min[run_id])


def admission_keep_mask_news(h1: np.ndarray, h2: np.ndarray,
                             page_pos: np.ndarray, link_pos: np.ndarray,
                             bloom) -> np.ndarray:
    """News-mode winner selection: keep the single FIRST proposal of each
    url by (page_pos, link_pos) order among candidates not in the bloom.

    Differences from the dfs mask (news.go:248-262 vs dfs_basic.go):
    ``seenUrls.SetBytes`` runs INSIDE urlAllowed per url, so a url's
    second proposal is blocked even within the same page (no same-page
    duplicate quirk), and the fetched page itself is never marked (no
    marker rows). Same hash-grouping collision argument as
    admission_keep_mask."""
    n = len(h1)
    idx = np.lexsort((h2, h1))
    h1s, h2s = h1[idx], h2[idx]
    new_run = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
    run_starts = np.flatnonzero(new_run)
    run_id_sorted = np.cumsum(new_run) - 1
    run_id = np.empty(n, dtype=np.int64)
    run_id[idx] = run_id_sorted

    in_bloom = _seen_mask(bloom, h1, h2)

    # (page_pos, link_pos) packed into one sortable key; link_pos is the
    # within-caption index, far below 2^21
    key = page_pos.astype(np.int64) * (np.int64(1) << np.int64(21)) \
        + link_pos.astype(np.int64)
    km = np.where(~in_bloom, key, _SENTINEL)
    run_min = np.minimum.reduceat(km[idx], run_starts)
    return (~in_bloom) & (key == run_min[run_id])


def assign_global_rank(df: DataFrame, order_cols: list[str], pid_expr,
                       out_col: str = "rn", partitions: int | None = None,
                       timings: dict | None = None,
                       out_stats: dict | None = None) -> DataFrame:
    """Distributed 0-based global rank by ``order_cols`` (must be a unique
    key) — no single-partition window, no row pickling, no sampling pass.

    ``pid_expr`` is a caller-supplied integer Column that is MONOTONE
    non-decreasing w.r.t. the order (e.g. floor(major_key / chunk)): rows
    are hash-shuffled by it, sorted within partitions, then per-pid offsets
    (one tiny collect) plus per-pid running counters are added in a single
    Arrow pass."""
    spark = df.sparkSession
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)
    import time as _time
    cols = [F.col(c) for c in order_cols]
    t0 = _time.perf_counter()
    sorted_df = (df.withColumn("_pid", pid_expr.cast("long"))
                 .repartition(partitions, F.col("_pid"))
                 .sortWithinPartitions(*cols)
                 .localCheckpoint(eager=True))
    t1 = _time.perf_counter()
    counts = dict(sorted_df.groupBy("_pid").count().collect())
    if timings is not None:
        timings["adm_rank_ckpt"] = timings.get("adm_rank_ckpt", 0.0) + t1 - t0
        timings["adm_rank_counts"] = timings.get("adm_rank_counts", 0.0) \
            + _time.perf_counter() - t1
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if out_stats is not None:
        out_stats["total"] = acc  # row count, free from the offsets pass
    schema = sorted_df.drop("_pid").schema.add(out_col, "long")

    def add_rank(it):
        seen: dict[int, int] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            pids = pdf["_pid"].to_numpy()
            rn = np.empty(len(pdf), dtype=np.int64)
            # pids appear in contiguous runs (sorted by order_cols and pid
            # is monotone in them)
            start = 0
            while start < len(pdf):
                pid = int(pids[start])
                end = start
                while end < len(pdf) and pids[end] == pid:
                    end += 1
                base = offsets[pid] + seen.get(pid, 0)
                rn[start:end] = np.arange(base, base + (end - start))
                seen[pid] = seen.get(pid, 0) + (end - start)
                start = end
            out = pdf.drop(columns=["_pid"])
            out[out_col] = rn
            yield out

    return sorted_df.mapInPandas(add_rank, schema)


def assign_global_prefix_sum(df: DataFrame, order_cols: list[str], pid_expr,
                             weight_col: str, out_col: str = "psum",
                             partitions: int | None = None) -> DataFrame:
    """Distributed EXCLUSIVE prefix sum of ``weight_col`` in ``order_cols``
    order — the weighted generalization of :func:`assign_global_rank`
    (rank == prefix sum of weight 1). Same contract: ``order_cols`` is a
    unique key, ``pid_expr`` is an integer Column monotone non-decreasing
    in that order; rows shuffle once by pid, per-pid weight totals come
    from one tiny collect, and a single Arrow pass adds
    ``out_col = sum of all earlier rows' weights`` (first row gets 0).

    Weights must be non-negative integers (the result is exact int64,
    so an engine twin — e.g. DuckDB ``sum() OVER (... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` — is bit-identical).

    Deliberately NOT unified with assign_global_rank (rank ==
    prefix-sum of weight 1, so the bodies mirror each other): the rank
    variant is the crawl admission hot path, carries timings/out_stats
    instrumentation the engine's profiler depends on, and is pinned by
    the bit-exact oracle suite — rewiring it through this function buys
    ~40 shared lines at the cost of churning that path. If you change
    the shared invariants (pid monotone in order, contiguous pid runs
    after sortWithinPartitions, per-pid carry across Arrow batches),
    change BOTH."""
    spark = df.sparkSession
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)
    cols = [F.col(c) for c in order_cols]
    sorted_df = (df.withColumn("_pid", pid_expr.cast("long"))
                 .repartition(partitions, F.col("_pid"))
                 .sortWithinPartitions(*cols)
                 .localCheckpoint(eager=True))
    totals = {r["_pid"]: r["_w"] for r in
              sorted_df.groupBy("_pid")
              .agg(F.sum(F.col(weight_col).cast("long")).alias("_w"))
              .collect()}
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid])
    schema = sorted_df.drop("_pid").schema.add(out_col, "long")

    def add_psum(it):
        carry: dict[int, int] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            pids = pdf["_pid"].to_numpy()
            w = pdf[weight_col].to_numpy().astype(np.int64)
            ps = np.empty(len(pdf), dtype=np.int64)
            start = 0
            while start < len(pdf):
                pid = int(pids[start])
                end = start
                while end < len(pdf) and pids[end] == pid:
                    end += 1
                run = w[start:end]
                base = offsets[pid] + carry.get(pid, 0)
                # exclusive cumsum of the run, shifted by what this pid
                # has already emitted in earlier batches
                ps[start:end] = base + np.concatenate(
                    ([0], np.cumsum(run[:-1])))
                carry[pid] = carry.get(pid, 0) + int(run.sum())
                start = end
            out = pdf.drop(columns=["_pid"])
            out[out_col] = ps
            yield out

    return sorted_df.mapInPandas(add_psum, schema)


def bloom_words_df(spark: SparkSession, bloom: BloomFilter) -> DataFrame:
    """The bloom bitmap as a DataFrame of (word_idx:long, word:long) —
    the distributed representation for scales where the bitmap no longer
    broadcasts (10^10 keys at p=0.001 is a ~26 GB bitmap; broadcast is
    the right plan up to ~10^9). Words are the same uint64 lanes the
    in-memory filter uses, reinterpreted as int64."""
    import pandas as pd
    widx = np.flatnonzero(bloom.words)  # sparse: only non-zero words
    pdf = pd.DataFrame({"word_idx": widx.astype(np.int64),
                        "word": bloom.words[widx].view(np.int64)})
    return spark.createDataFrame(pdf, "word_idx long, word long")


def bloom_probe_distributed(cands: DataFrame, url_col: str,
                            words: DataFrame, max_n: int,
                            p: float) -> DataFrame:
    """Membership probe with BIT-IDENTICAL semantics to the in-memory
    filter, but against the distributed bitmap: each candidate explodes
    into its k probe positions, positions join the words table on
    word_idx (zero words are absent — a miss is a zero word), and a
    candidate is a member iff every probe bit is set. Cost is O(k x G)
    join rows per round — G-bounded, never O(bitmap). Returns ``cands``
    plus an ``in_bloom`` boolean column.

    This is the 10^10-scale fallback for SURVEY J3; the broadcast probe
    (make_bloom_probe / the fused admission pass) is the fast path while
    the bitmap fits executor memory."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    proto = BloomFilter(max_n, p)
    k = proto.k

    @pandas_udf(T.ArrayType(T.LongType()))
    def probe_positions(urls: pd.Series) -> pd.Series:
        local = BloomFilter(max_n, p)
        pos = local.probes_batch(urls.tolist())  # (n, k) uint64
        return pd.Series(list(pos.astype(np.int64)))

    # a unique row id carries each candidate through the explode/regroup
    # so exact-duplicate candidate rows KEEP their multiplicity — grouping
    # on the candidate columns instead would silently collapse them, and
    # the reference's same-page duplicate-admission quirk depends on
    # duplicates surviving to the admission stage
    with_id = cands.withColumn("_rid", F.monotonically_increasing_id())
    probes = (with_id.withColumn("_pos", probe_positions(F.col(url_col)))
              .withColumn("_p", F.explode("_pos")).drop("_pos")
              .withColumn("_widx", (F.col("_p") / F.lit(64)).cast("long"))
              .withColumn("_bit", F.col("_p") % F.lit(64)))
    joined = probes.join(words.withColumnRenamed("word_idx", "_widx"),
                         "_widx", "left")
    # SQL shiftright accepts a column shift amount; arithmetic shift's
    # sign extension never touches bit 0 for shifts < 64, and at bit 63
    # the sign IS the probed bit — so `& 1` is exact for all 64 lanes
    bit_set = F.when(
        F.col("word").isNotNull()
        & (F.expr("shiftright(word, CAST(_bit AS INT)) & 1") == 1),
        1).otherwise(0)
    group_cols = [c for c in cands.columns]
    return (joined.withColumn("_hit", bit_set)
            .groupBy("_rid", *group_cols)
            .agg((F.sum("_hit") == F.lit(k)).alias("in_bloom"))
            .drop("_rid"))


def make_robots_udf(spark: SparkSession, rules_by_host: dict):
    """Vectorized robots gate (SURVEY F5/J2): broadcast tiny rules table,
    longest-prefix Allow/Disallow per batch."""
    bc = spark.sparkContext.broadcast(rules_by_host)

    @pandas_udf("boolean")
    def robots_ok(hosts: pd.Series, urls: pd.Series) -> pd.Series:
        rules = bc.value
        paths = [path_of(u) for u in urls]
        return pd.Series(allowed_batch(rules, hosts.tolist(), paths))

    return robots_ok, bc


def salted_repartition(df: DataFrame, key: str, n_partitions: int,
                       n_salts: int = 8, salt_col: str = "url") -> DataFrame:
    """Explicit salted repartitioning on hash(key) to break hot-host skew
    (BASELINE.json north_star; SURVEY §4.2.1). Used for the
    order-insensitive fetch/extract stage; order is restored downstream by
    the explicit (priority, enqueue_round, enqueue_seq) keys."""
    salt = F.pmod(F.hash(F.col(salt_col)).cast("long"), F.lit(n_salts))
    return df.repartition(n_partitions, F.pmod(
        F.hash(F.col(key)).cast("long") * F.lit(n_salts) + salt,
        F.lit(n_partitions)))
