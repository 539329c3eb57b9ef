"""Driver contract for the spark-graft builder (PySpark target).

One ``queries()`` entry per implemented operator family from SURVEY.md §2
(sources/filters/joins/aggregations/orders/set-ops/scalar-fns + the
training-data-pipeline operators), each with a DuckDB ``oracle_sql()``
twin. Column names/aliases match exactly; every float output derives from
exact integer arithmetic (int-cents / int-milli) or a single IEEE division
of identical integers, so value hashes agree across engines.

The crawl engine itself (frontier, bloom, politeness, robots, snapshots —
the BASELINE.json north rule) is exercised by tests/test_crawl_spark.py
against the Python oracle; the multimodal payload path (binary image
decode in mapInPandas) runs there too, since the driver tables carry no
binary column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col):
    """Exact integer cents from a 2-decimal double (same double → same
    HALF_UP rounding in Spark and DuckDB)."""
    return F.round(col * 100).cast("long")


def _ts(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# individual queries — q_<fn>(spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark, sf):
    """A-family scan+agg (SURVEY A1-shape on lineitem; TPC-H Q1)."""
    li = _t(spark, sf, "lineitem")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"),
                 F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
                 F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_cents"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q3_shipping_priority(spark, sf):
    """3-way join + agg + top-k (J1/J2 + O3)."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
            .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
            .orderBy(F.desc("revenue_cents"), "orderdate", "l_orderkey")
            .limit(10))


def o1_fifo_dequeue(spark, sf):
    """O1 file-queue order: global (ts, id) FIFO cap (queue/file.go:250-274)."""
    ev = _t(spark, sf, "events")
    return (ev.orderBy("ts", "event_id").limit(500)
            .select("event_id", _ts("ts").alias("ts_s"), "event_type"))


def o2_politeness_window(spark, sf):
    """O2 per-host politeness: first-B-per-key rank then global top-G —
    the engine's dequeue (operators/frontier.py:dequeue) on driver data."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.withColumn("host_rank", F.row_number().over(w))
            .filter(F.col("host_rank") <= 3)
            .orderBy("ts", "event_id").limit(200)
            .select("user_id", "event_id", "host_rank", _ts("ts").alias("ts_s")))


def o3_search_order(spark, sf):
    """ES search template: timestamp asc, cap 10000 (filter/constants.go:14-26)."""
    ev = _t(spark, sf, "events")
    return (ev.orderBy("ts", "event_id").limit(10000)
            .select("event_id", "user_id", _ts("ts").alias("ts_s")))


def o3_f10_search_ops(spark, sf):
    """O3 ES search-template order/cap + F10 default field projection in
    ONE tagged entry (consolidated to free the gate slot for
    pack_training_shards; both single-op functions stay callable)."""
    a = o3_search_order(spark, sf).select(
        F.lit("o3_order").alias("op"),
        F.col("event_id").cast("string").alias("k1"),
        F.col("ts_s").alias("k2"),
        F.col("user_id").cast("long").alias("n"))
    b = f10_field_projection(spark, sf).select(
        F.lit("f10_projection").alias("op"),
        F.col("doc_id").cast("string").alias("k1"),
        F.col("lang").alias("k2"),
        F.col("n_chars").cast("long").alias("n"))
    return a.unionByName(b).orderBy("op", "k1")


def o4_refill_pick(spark, sf):
    """O4 refill host pick: first (lexicographic) group with enough rows."""
    d = _t(spark, sf, "documents")
    return (d.groupBy("source").count().filter(F.col("count") > 10)
            .agg(F.min("source").alias("first_source")))


def a1_metric_date_histogram(spark, sf):
    """A1 ES date_histogram + sum/avg (filter/search_metric.go:42-128)."""
    ev = _t(spark, sf, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    vm = F.round(F.col("value") * 1000).cast("long")
    return (ev.groupBy(day, "event_type")
            .agg(F.sum(vm).alias("value_sum_milli"), F.count("*").alias("n"))
            .withColumn("value_avg_milli",
                        F.col("value_sum_milli").cast("double") / F.col("n"))
            .orderBy("day", "event_type"))


def a2_tumbling_window_mean(spark, sf):
    """A2 client-side tumbling window aggregator (util/aggregator.go:62-138)."""
    ev = _t(spark, sf, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH").alias("hour")
    vm = F.round(F.col("value") * 1000).cast("long")
    return (ev.groupBy(hour)
            .agg(F.sum(vm).alias("value_sum_milli"), F.count("*").alias("n"),
                 F.min(_ts(F.col("ts"))).alias("min_ts"))
            .orderBy("hour"))


def a4_dedupe_first_occurrence(spark, sf):
    """A4 order-preserving first-occurrence dedupe (util/util.go:23-37)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
            .select("user_id", "event_id", _ts("ts").alias("ts_s"))
            .orderBy("user_id"))


def a5_subdomain_explosion(spark, sf):
    """A5 count-distinct-vs-threshold (extractors/adversarial.go:105-128 shape)."""
    c = _t(spark, sf, "customer")
    return (c.groupBy("c_nationkey")
            .agg(F.countDistinct("c_mktsegment").alias("n_segments"))
            .withColumn("explosion", F.col("n_segments") >= 5)
            .orderBy("c_nationkey"))


def a6_enumeration_pairs(spark, sf):
    """A6 off-by-one pair counting (extractors/adversarial.go:69-103 shape):
    self-join on size+1 within p_type."""
    a = _t(spark, sf, "part").select("p_type", F.col("p_size").alias("size_a"))
    b = _t(spark, sf, "part").select(F.col("p_type").alias("p_type_b"),
                                     F.col("p_size").alias("size_b"))
    return (a.join(b, (a.p_type == b.p_type_b) & (a.size_a == b.size_b + 1))
            .groupBy("p_type").agg(F.count("*").alias("pairs"))
            .orderBy("p_type"))


def a5_a6_extract_rollups(spark, sf):
    """A5 count-distinct-explosion + A6 off-by-one pair counting in ONE
    tagged driver entry (consolidated to free the gate slot for
    image_bucket_batches; both single-op functions stay callable)."""
    a = a5_subdomain_explosion(spark, sf).select(
        F.lit("a5_explosion").alias("op"),
        F.col("c_nationkey").cast("string").alias("key"),
        F.col("n_segments").cast("long").alias("n"),
        F.col("explosion").alias("flag"))
    b = a6_enumeration_pairs(spark, sf).select(
        F.lit("a6_pairs").alias("op"), F.col("p_type").alias("key"),
        F.col("pairs").cast("long").alias("n"), F.lit(False).alias("flag"))
    return a.unionByName(b).orderBy("op", "key")


def j1_payload_lookup(spark, sf):
    """J1 request⋈payload broadcast hash join (worker/extractor/composite.go:175-181)."""
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    c = _t(spark, sf, "customer")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select("o_orderkey", "c_name", _cents(F.col("o_totalprice")).alias("price_cents"))
            .orderBy("o_orderkey"))


def j2_robots_lookup(spark, sf):
    """J2 url⋈robots tiny-dim broadcast join (frontier/robotstxt.go:73-94)."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    return (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.round("l_quantity").cast("long")).alias("qty_sum"))
            .orderBy("s_name"))


def j3_seen_anti_join(spark, sf):
    """J3 seen-set subtraction: left_anti (dfs_basic.go:89). Orders with
    no lineitem rows — 257 rows at sf0.01, so the anti-join gate is
    non-vacuous (the old customer→orders pair was empty: every customer
    has orders in this synthetic data, VERDICT r2)."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
            .select("o_orderkey").orderBy("o_orderkey"))


def j4_unvisited_semi_join(spark, sf):
    """J4 visited-hosts gate: left_semi (worker/publisher/dfs_basic.go:103)."""
    s = _t(spark, sf, "supplier")
    li = _t(spark, sf, "lineitem")
    return (s.join(li, s.s_suppkey == li.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name").orderBy("s_suppkey"))


def j5_stream_filter_cross(spark, sf):
    """J5 stream entity × client filter N×M (gateway/client_streamer.go:103-123)."""
    r = _t(spark, sf, "region").select("r_name")
    st = _t(spark, sf, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(st).orderBy("r_name", "o_orderstatus")


def f3_regex_filter(spark, sf):
    """F3 regex URL filter (frontier/regex.go:24-26). Pattern chosen to
    MATCH on the driver tables (21 rows at sf0.01) so the gate checks
    real regex evaluation, not an empty set (VERDICT r2)."""
    p = _t(spark, sf, "part")
    return (p.filter(F.col("p_name").rlike("red.*bolt"))
            .select("p_partkey", "p_name").orderBy("p_partkey"))


def f6_same_domain_split(spark, sf):
    """F6 same-domain gate split into enqueue|stash branches
    (worker/accumulator/dfs_basic.go:73-119)."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    branch = F.when((F.col("c_nationkey") == 7) & (F.col("o_totalprice") < 300000),
                    F.lit("enqueue")).otherwise(F.lit("stash"))
    return (j.select(branch.alias("branch"))
            .groupBy("branch").agg(F.count("*").alias("n")).orderBy("branch"))


def f8_news_admission(spark, sf):
    """F8: the REAL news.go admission heuristics
    (worker/accumulator/news.go:211-290, blacklists :22-76) as column
    expressions — exact-host gate, 35-suffix extension blacklist,
    looks-like-article path heuristic ('article' first-token bypass,
    >20-char token requirement, first-token substring blacklist), and
    the ':'+'=' path gate — over URLs synthesized deterministically from
    the documents table so every branch is exercised."""
    from delver_spark.functions.news import news_url_allowed

    d = _t(spark, sf, "documents")
    first_tok = F.element_at(
        F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != ""), 1)
    m = F.col("doc_id") % 5
    did = F.col("doc_id").cast("string")
    path = (F.when(m == 0, F.concat(F.lit("/article/"), first_tok,
                                    F.lit("-"), did))
            .when(m == 1, F.concat(F.lit("/tag/"), first_tok))
            .when(m == 2, F.concat(F.lit("/"), first_tok, F.lit("/"),
                                   F.repeat(F.lit("x"), 25)))
            .when(m == 3, F.concat(F.lit("/img/pic-"), did, F.lit(".jpg")))
            .otherwise(F.lit("/article/x:1=2")))
    origin_host = F.concat(F.lit("news."), F.col("source"), F.lit(".test"))
    host = F.when(F.col("doc_id") % 7 == 0, F.lit("other.test")) \
        .otherwise(origin_host)
    return (d.withColumn("path", path)
            .withColumn("host", host)
            .withColumn("origin_host", origin_host)
            .select("doc_id", "path",
                    news_url_allowed(F.col("path"), F.col("host"),
                                     F.col("origin_host")).alias("admitted"))
            .orderBy("doc_id"))


def f9_content_type_gate(spark, sf):
    """F9 content-type contains gate (news.go:193-209 shape)."""
    d = _t(spark, sf, "documents")
    return (d.filter(F.col("source").contains("1"))
            .select("doc_id", "source").orderBy("doc_id"))


def f10_field_projection(spark, sf):
    """F10 default field projection (filter/constants.go:5-12)."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id", "lang", "n_chars").orderBy("doc_id")


def set_union_nations(spark, sf):
    """Set op: union distinct (SURVEY §2.6)."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


def set_except_unshipped(spark, sf):
    """Set op: except over distinct keys (orderkeys never shipped —
    257 rows at sf0.01; the old customer-vs-supplier nationkey pair was
    empty because both cover all 25 nations, VERDICT r2)."""
    o = _t(spark, sf, "orders").select(F.col("o_orderkey").alias("orderkey")).distinct()
    li = _t(spark, sf, "lineitem").select(F.col("l_orderkey").alias("orderkey")).distinct()
    return o.exceptAll(li).orderBy("orderkey")


def x11_x12_scalar_fns(spark, sf):
    """X11 payload MD5 (resource/objectstore/filesystem.go:37-51) + X12
    naive SLD+TLD split (util/util.go:92-101) in ONE driver entry:
    per-customer md5 checksum plus a 3-label host synthesized from the
    digest and split into its last-two-label domain. Consolidated from
    the r3 separate x11/x12 entries (same move as x14+o6) to free a
    50-entry gate slot for dedup_resolve_canonical; both scalar
    functions keep the 1500-row customer gate."""
    c = _t(spark, sf, "customer")
    md5c = F.md5(F.col("c_name"))
    host = F.concat(F.substring(md5c, 1, 8), F.lit("."),
                    F.substring(md5c, 9, 4), F.lit(".test"))
    domain = F.array_join(F.slice(F.split(host, "\\."), -2, 2), ".")
    return (c.select("c_custkey", md5c.alias("name_md5"),
                     host.alias("host"), domain.alias("domain"))
            .orderBy("c_custkey"))


def x13_json_extract(spark, sf):
    """X13 JSON flatten (util/util.go:220-238 shape)."""
    ev = _t(spark, sf, "events")
    return (ev.select("event_id",
                      F.get_json_object("props", "$.k").cast("long").alias("k_val"))
            .orderBy("event_id").limit(2000))


def t2_stream_composite_filter(spark, sf):
    """T2 conjunctive stream filter (filter/stream_composite.go:47-246);
    batch twin of the Structured Streaming variant (delver_spark.streaming)."""
    d = _t(spark, sf, "documents")
    return (d.filter(F.col("lang").isin("en", "es")
                     & F.col("n_chars").between(100, 5000)
                     & F.col("text").contains("the"))
            .select("doc_id").orderBy("doc_id"))



def f2_multi_filter(spark, sf):
    """F2 multiFilter: AND of sub-filters in one predicate
    (frontier/multi.go:19-49)."""
    p = _t(spark, sf, "part")
    return (p.filter(F.col("p_name").rlike("red")
                     & F.col("p_size").between(10, 30)
                     & F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#3"))
            .select("p_partkey", "p_name", "p_size").orderBy("p_partkey"))


def f4_null_filter(spark, sf):
    """F4 nullFilter: always-true predicate (frontier/null.go:9-11)."""
    r = _t(spark, sf, "region")
    return r.filter(F.lit(True)).select("r_regionkey", "r_name").orderBy("r_regionkey")


def x14_o6_scalar_fns(spark, sf):
    """X14 base64url host dir name (resource/maps/multi_domain.go:90
    shape) + O6 dashboard first-by-name order (gateway/dashboard.go:25-28)
    in ONE driver entry: per-nation base64 host dir, flagged with whether
    the nation is the ORDER BY name ASC LIMIT 1 pick (broadcast of the
    1-row top-1 result). Consolidated from the r3 separate x14/o6
    entries so the 50-entry driver gate covers every queries() key
    (VERDICT r3 "what's wrong" #1 — doc_fingerprint was the 51st and got
    no CORRECTNESS row)."""
    n = _t(spark, sf, "nation")
    host = F.concat(F.lower(F.regexp_replace("n_name", " ", "")), F.lit(".test"))
    first = (n.orderBy("n_name").limit(1)
             .select(F.col("n_name").alias("first_name")))
    return (n.crossJoin(F.broadcast(first))
            .select("n_nationkey",
                    F.base64(host.cast("binary")).alias("host_b64"),
                    (F.col("n_name") == F.col("first_name"))
                    .alias("is_first_by_name"))
            .orderBy("n_nationkey"))


# --- training-data pipeline operators (documents/embeddings) ----------------
# implementations live in delver_spark.operators.{dedup,similarity,textstats}

from delver_spark.operators import dedup as _dedup  # noqa: E402
from delver_spark.operators import similarity as _sim  # noqa: E402
from delver_spark.operators import textstats as _txt  # noqa: E402


def dedup_exact(spark, sf):
    """Exact dedup: md5 fingerprint → keeper=min(doc_id), group size."""
    return _dedup.exact_dedup(_t(spark, sf, "documents"))



def dedup_minhash_lsh(spark, sf):
    """MinHash+LSH near-dup candidates: 8 md5-based hashes over the distinct
    token set, 4 bands of 2 → pairs sharing any band bucket. bucket_cap
    routes oversized duplicate clusters through the salted self-join
    (identical output, skew-safe plan) so the driver's correctness gate
    exercises the salted path too."""
    return _dedup.minhash_lsh_pairs(_t(spark, sf, "documents"),
                                    bucket_cap=2048)


def dedup_ngram_jaccard(spark, sf):
    """Word-bigram Jaccard near-dups: DF-capped shared-shingle candidate
    join (stop-shingles excluded from pairing), exact Jaccard verify over
    full shingle sets — sub-quadratic at corpus scale."""
    return _dedup.ngram_jaccard_pairs(_t(spark, sf, "documents"))


def dedup_minhash_verified(spark, sf):
    """MinHash+LSH candidates + exact-Jaccard verify (>= 0.5) over the
    distinct token sets: LSH proposes, the verify stage decides."""
    return _dedup.minhash_lsh_verified(_t(spark, sf, "documents"))


def _planted_embeddings(spark, sf, dim: int = 64, with_label: bool = False):
    """Embeddings table + deterministic planted near-duplicates, so the
    pair operators produce NON-EMPTY output at driver scale (VERDICT r2
    #1: the testdata embeddings are random → cos >= 0.95 is vacuously
    empty). For every vec_id % 4 == 0 a copy is added at vec_id + 10^6
    with exactly ONE dimension (index vec_id % dim) sign-flipped —
    float negation is exact in IEEE, and round-half-away-from-zero is
    sign-symmetric in both Spark and DuckDB, so the quantized planted
    vectors agree bit-for-bit across engines. The flipped-dim cosine is
    1 - 2*v_i^2/|v|^2 ~ 0.93-1.0, straddling the 0.95 threshold, so the
    verify stage is exercised on both sides of the cut."""
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding", "label")
    pert = F.transform(
        "embedding",
        lambda x, i: F.when(i.cast("long") == F.col("vec_id") % dim, -x)
        .otherwise(x))
    planted = (e.filter(F.col("vec_id") % 4 == 0)
               .select((F.col("vec_id") + 1000000).alias("vec_id"),
                       pert.alias("embedding"), "label"))
    out = e.unionByName(planted)
    # planted copies INHERIT the original's label (cluster), so the
    # cluster-scoped semdedup gate sees the planted pair inside one cell
    return out if with_label else out.drop("label")


def dedup_embedding_lsh(spark, sf):
    """Scale-safe embedding near-dup: random-hyperplane LSH buckets +
    exact int-cosine verify (replaces the all-pairs join at scale).
    Runs over the planted-near-dup union so the driver gate checks a
    non-empty pair set (see _planted_embeddings). dim=64 ships the
    driver-derived hyperplane matrix in the UDF closure (identical
    output, no per-worker re-derivation)."""
    return _dedup.embedding_lsh_pairs(_planted_embeddings(spark, sf),
                                      dim=64)


def dedup_components(spark, sf):
    """Duplicate-cluster assignment: connected components (iterative
    min-label propagation) over the ngram-Jaccard near-dup pairs;
    component = min doc id = the cluster keeper."""
    pairs = _dedup.ngram_jaccard_pairs(_t(spark, sf, "documents"))
    return _dedup.connected_components(pairs)


def dedup_components_star(spark, sf):
    """Duplicate-cluster assignment via the large-star/small-star CC
    variant (O(log² n) rounds — the long-chain swap-in) over the same
    ngram-Jaccard pair list; identical output to dedup_components, so
    it shares the recursive-CTE DuckDB twin."""
    pairs = _dedup.ngram_jaccard_pairs(_t(spark, sf, "documents"))
    return _dedup.connected_components_star(pairs)


def dedup_components_ops(spark, sf):
    """Tagged union of the two connected-components plans (same 50-slot
    consolidation policy as x14+o6): 'minlabel' = iterative min-label
    propagation, 'star' = large-star/small-star — the two MUST produce
    the identical component map, so the union pins both against one
    recursive-CTE twin in a single gate row."""
    d = _t(spark, sf, "documents")
    # materialize the pair set ONCE — both CC variants eagerly
    # checkpoint their own edge frames, so a lazy shared frame would
    # still compute the n-gram shuffle twice (r5 review finding)
    pairs = _dedup.ngram_jaccard_pairs(d).localCheckpoint(eager=True)
    minl = (_dedup.connected_components(pairs)
            .withColumn("method", F.lit("minlabel")))
    star = (_dedup.connected_components_star(pairs)
            .withColumn("method", F.lit("star")))
    return minl.unionByName(star).orderBy("method", "doc_id")


def dedup_semdedup(spark, sf):
    """SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup over
    the planted-near-dup embeddings — within-cell exact int-cosine
    pairs, min-label dup groups, keeper = lowest centroid-cosine (the
    paper's least-prototypical rule). The embeddings table's `label`
    column is the ingest-time cluster (IVF cell); planted copies
    inherit their original's label so the gate's dup pairs are
    in-cell and the keep=false branch is non-vacuous."""
    return _dedup.semdedup(_planted_embeddings(spark, sf, with_label=True))


def dedup_resolve_canonical(spark, sf):
    """Dedup resolution — the last step of a training-data dedup pass:
    ngram-Jaccard near-dup pairs → connected components → ONE canonical
    keeper per cluster (max n_chars, ties → min doc_id) → keep/drop
    decision for EVERY document, singletons keeping themselves
    (operators/dedup.py:resolve_canonical). Shares the recursive-CTE
    components body with dedup_components so the three stay in
    lockstep."""
    d = _t(spark, sf, "documents")
    pairs = _dedup.ngram_jaccard_pairs(d)
    comps = _dedup.connected_components(pairs)
    return _dedup.resolve_canonical(d.select("doc_id", "n_chars"), comps)


def dedup_phash_hamming(spark, sf):
    """Perceptual-hash near-dup pairs via banded join + exact Hamming
    verify; 60-bit hash synthesized deterministically from the text md5
    (the pages corpus carries real phashes; driver tables are text-only).

    Planted near-dups (VERDICT r2 #1 — random 60-bit hashes have no
    pairs at dist <= 12): for doc_id % 4 == 0 a copy at doc_id + 10^6
    flips 1 + doc_id % 3 disjoint bits (positions p, p+5, p+10 with
    p = doc_id % 5 — all inside band 0), so every planted pair has exact
    Hamming distance 1..3, is guaranteed a band-1..3 candidate match,
    and the driver gate checks a non-empty verified pair set."""
    d = _t(spark, sf, "documents")
    ph = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
    base = d.select("doc_id", ph.alias("phash"))
    mask = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 5 AS INT))"
        " + CASE WHEN doc_id % 3 >= 1 THEN"
        "   shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 5 + 5 AS INT))"
        "   ELSE 0 END"
        " + CASE WHEN doc_id % 3 >= 2 THEN"
        "   shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 5 + 10 AS INT))"
        "   ELSE 0 END")
    planted = (base.filter(F.col("doc_id") % 4 == 0)
               .select((F.col("doc_id") + 1000000).alias("doc_id"),
                       F.col("phash").bitwiseXOR(mask).alias("phash")))
    return _dedup.phash_hamming_pairs(base.unionByName(planted))


def image_bucket_batches(spark, sf):
    """SDXL-style aspect-ratio bucketed batch assignment
    (multimodal.aspect_bucket_batches): nearest-aspect bucket by exact
    integer milli-ratio midpoints, then deterministic fixed-size batch
    dealing per bucket. Image dims synthesized from doc_id (driver
    tables carry no image table); runs the scale_safe sharded-rank plan
    so the gate exercises the 100TB path, twin is the plain window."""
    from delver_spark.operators.multimodal import aspect_bucket_batches
    d = _t(spark, sf, "documents").select(
        "doc_id",
        (64 + (F.col("doc_id") * 7919) % 1984).cast("int").alias("w"),
        (64 + (F.col("doc_id") * 104729) % 1984).cast("int").alias("h"))
    out = aspect_bucket_batches(d, batch_size=16, order_col="doc_id",
                                scale_safe=True, chunk=4096)
    return (out.select(
        "doc_id", F.col("w").cast("long").alias("w"),
        F.col("h").cast("long").alias("h"),
        F.col("bucket_id").cast("long").alias("bucket_id"),
        F.col("bucket_w").cast("long").alias("bucket_w"),
        F.col("bucket_h").cast("long").alias("bucket_h"),
        "batch_idx", "slot").orderBy("doc_id"))



def pack_training_shards(spark, sf):
    """Deterministic fixed-range shard packing (assemble.pack_shards):
    documents in doc_id order cut into ~4 KB training shards by exact
    int64 prefix-sum arithmetic. Runs the scale_safe distributed
    prefix-sum plan (frontier.assign_global_prefix_sum) so the gate
    exercises the 100TB path; the twin is the plain SQL window."""
    from delver_spark.operators.assemble import pack_shards
    d = _t(spark, sf, "documents").select(
        "doc_id", F.octet_length("text").cast("long").alias("nbytes"))
    out = pack_shards(d, "nbytes", "doc_id", 4096,
                      scale_safe=True, chunk=64)
    return (out.select("doc_id", "nbytes", "shard_id", "sample_idx",
                       "offset_in_shard").orderBy("doc_id"))


def ann_cosine_topk(spark, sf):
    """Brute-force ANN baseline: exact int-quantized dot products, top 10."""
    return _sim.cosine_topk_bruteforce(_t(spark, sf, "embeddings"), 0, 10)


def ann_ivf_label(spark, sf):
    """IVF-style cell-restricted ANN: probe only the query's coarse cell."""
    return _sim.cosine_topk_ivf(_t(spark, sf, "embeddings"), 0, 5)


def ann_topk_ops(spark, sf):
    """Tagged union of the top-k search plans (50-slot consolidation,
    same policy as x14+o6): 'brute' = exact all-rows top-10, 'ivf' =
    cell-restricted top-5, 'batch<qid>' = the bulk one-corpus-pass
    surface (cosine_topk_ivf_batch, r5-s4) for corpus vectors 1/2/3 as
    queries — real corpus ids so the self-exclusion rule is exercised;
    probe = top-2 cells by summed-centroid dot over ALL cells (no
    own-cell prepend — batch queries are external by contract). One
    dots CTE serves brute/ivf in the twin; the batch leg re-derives
    the probe ranking per query in SQL."""
    emb = _t(spark, sf, "embeddings")
    brute = (_sim.cosine_topk_bruteforce(emb, 0, 10)
             .join(emb.select("vec_id", "label"), "vec_id")
             .withColumn("method", F.lit("brute")))
    ivf = (_sim.cosine_topk_ivf(emb, 0, 5)
           .withColumn("method", F.lit("ivf")))
    queries = (emb.filter(F.col("vec_id").isin([1, 2, 3]))
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    batch = (_sim.cosine_topk_ivf_batch(
                 emb, queries, k=5, n_probe=2,
                 index=_ivf_index_for(spark, sf))
             .join(emb.select("vec_id", "label"), "vec_id")
             .withColumn("method", F.concat(
                 F.lit("batch"), F.col("query_id").cast("string"))))
    cols = ["method", "vec_id", "label", "dot_milli2"]
    return (brute.select(cols).unionByName(ivf.select(cols))
            .unionByName(batch.select(cols))
            .orderBy("method", F.desc("dot_milli2"), "vec_id"))


def ann_kmeans_cells(spark, sf):
    """Deterministic spherical k-means (similarity.kmeans_cells): the
    coarse quantizer that PRODUCES the cell ids the IVF index and
    semdedup consume (every other ANN/semantic-dedup gate takes the
    ingest label as given; this one fits it). k=4, n_iter=2; the twin
    unrolls the identical two Lloyd's iterations + final assignment in
    SQL — exact integer dots, the same sign(d)·f64(d)²/f64(‖c‖²)
    ranking, ties → lowest cell."""
    from delver_spark.operators.similarity import kmeans_cells
    return (kmeans_cells(_t(spark, sf, "embeddings"), k=4, n_iter=2)
            .orderBy("vec_id"))


# ingest-time IVF index, built once per (sf_dir, table mtime) and reused
# across gate/bench invocations so ann_ivf_nprobe measures the
# steady-state probe cost, not a per-query index rebuild (VERDICT r3
# "what's wrong" #2). Incremental maintenance on append is
# similarity.merge_ivf_index (pinned by test_plans).
_IVF_INDEX_CACHE: dict[tuple, dict] = {}


def _ivf_index_for(spark, sf):
    import os

    path = f"{sf}/embeddings.parquet"
    try:
        key = (sf, os.stat(path).st_mtime_ns)
    except OSError:
        key = (sf, None)
    if key not in _IVF_INDEX_CACHE:
        _IVF_INDEX_CACHE[key] = _sim.build_ivf_index(_t(spark, sf, "embeddings"))
    return _IVF_INDEX_CACHE[key]


def ann_ivf_nprobe(spark, sf):
    """Multi-cell IVF probe: the query's cell plus the 2 next cells by
    exact summed-centroid dot product (engine-exact ranking). The cell
    ranking reads the precomputed ingest-time index (built once per
    (sf, table-mtime), cached — no per-query full-table aggregation)."""
    emb = _t(spark, sf, "embeddings")
    return _sim.cosine_topk_ivf(emb, 0, 8, n_probe=3,
                                index=_ivf_index_for(spark, sf))


def text_token_count(spark, sf):
    """Token counting over documents (whitespace tokenizer)."""
    return _txt.token_count(_t(spark, sf, "documents"))


def text_quality_score(spark, sf):
    """Quality scoring: token stats + stopword hits, integer outputs."""
    return _txt.quality_score(_t(spark, sf, "documents"))


def text_language_id(spark, sf):
    """Heuristic language-ID: stopword-count argmax (X5 capability shape)."""
    return _txt.language_id(_t(spark, sf, "documents"))


def text_quality_ops(spark, sf):
    """Quality scoring + heuristic language-ID in ONE tagged driver
    entry (consolidated r5-s9 to free a gate slot for text_lm_score,
    same 50-slot policy as x14+o6); the single-op functions above stay
    for the bench.py headline series."""
    q = text_quality_score(spark, sf).select(
        F.lit("quality").alias("op"), "doc_id",
        F.col("n_chars").cast("long").alias("v1"),
        F.col("n_tokens").cast("long").alias("v2"),
        F.col("the_hits").cast("long").alias("v3"),
        F.col("avg_tok_len_milli").cast("long").alias("v4"),
        F.col("quality_ok").cast("long").alias("v5"),
        F.lit("-").alias("s1"))
    lang = text_language_id(spark, sf).select(
        F.lit("lang").alias("op"), "doc_id",
        *[F.lit(-1).cast("long").alias(f"v{i}") for i in range(1, 6)],
        F.col("lang_pred").alias("s1"))
    return q.unionByName(lang).orderBy("op", "doc_id")


# Planted LM docs: zzq* tokens are absent from the corpus (verified),
# so the planted rows deterministically exercise EVERY backoff branch —
# trigram hit, bigram hit at its max order, backed-off bigram (b=1),
# double-backed-off unigram (b=2), OOV, and the zero-token doc —
# regardless of corpus content. Lowercase a-z only (the VALUES-twin
# embedding rule: no quotes/backslashes).
_LM_TRAIN_PLANT = "zzqa zzqb zzqc zzqb zzqc zzqd"
_LM_SCORE_PLANTS = [
    (1000001, "zzqa zzqb zzqc zzqd zzqb zzoov"),
    (1000002, "zzqd zzqb zzqc"),
    (1000003, ""),
]


def text_lm_score(spark, sf):
    """CCNet-shape n-gram LM quality scoring (functions/ngram_lm.py):
    train Stupid-Backoff trigram counts on documents + a planted doc,
    score documents + planted docs (incl. an OOV token and an empty
    doc). All-integer outputs — the quantized micro-probability sum is
    exact in both engines; the DuckDB twin recomputes the counts and
    replays the same integer backoff arithmetic in SQL."""
    from delver_spark.functions import ngram_lm

    docs = (_t(spark, sf, "documents").select("doc_id", "text")
            .filter(F.col("text").isNotNull()))
    train = docs.select("text").unionByName(
        spark.createDataFrame([(_LM_TRAIN_PLANT,)], "text string"))
    score = docs.unionByName(spark.createDataFrame(
        _LM_SCORE_PLANTS, "doc_id long, text string"))
    counts = ngram_lm.train_ngram_lm(train)
    return ngram_lm.lm_score(score, counts)


def doc_fingerprint(spark, sf):
    """Document fingerprinting: md5 over (length, head-64, tail-64).
    A <64-char doc is planted (doc_id 10^6) so the gate exercises the
    greatest(n_chars-63, 1) tail-start clamp in both engines (VERDICT r3
    #4 — testdata min n_chars is 48, but only via the accidental
    negative-start agreement before the clamp)."""
    d = _t(spark, sf, "documents").select("doc_id", "text", "n_chars")
    short_text = "tiny planted doc"
    short = spark.createDataFrame(
        [(1000000, short_text, len(short_text))],
        "doc_id long, text string, n_chars long")
    return _txt.fingerprint(d.unionByName(short))


def text_bpe_tokens(spark, sf):
    """BPE-ish regex pre-tokenizer counts (token budgeting for training
    pipelines): letter runs | digit runs | single punctuation."""
    return _txt.bpe_token_count(_t(spark, sf, "documents"))


def text_token_ops(spark, sf):
    """Whitespace token counts + BPE-ish pre-tokenizer counts in ONE
    tagged entry (consolidated r5 to free a gate slot for
    text_bpe_encode — the REAL BPE op; -1 sentinels keep the value
    dtypes integral on both engines)."""
    a = text_token_count(spark, sf).select(
        F.lit("ws").alias("op"), "doc_id",
        F.col("n_tokens").cast("long").alias("v1"),
        F.col("n_chars").cast("long").alias("v2"),
        F.lit(-1).cast("long").alias("v3"))
    b = text_bpe_tokens(spark, sf).select(
        F.lit("pretok").alias("op"), "doc_id",
        F.col("n_bpe_tokens").cast("long").alias("v1"),
        F.col("n_word_tokens").cast("long").alias("v2"),
        F.col("n_digit_tokens").cast("long").alias("v3"))
    return a.unionByName(b).orderBy("op", "doc_id")


# Planted docs for the real-BPE gate: the driver corpus is a 31-word
# salad, so natural-language plants make the merge table non-vacuous
# (words that merge fully, partially, and not at all), and the empty
# doc exercises the zero-words path. Same VALUES-embedding constraints
# as _REP_DOCS (no quotes/backslashes).
_BPE_DOCS = [
    (3100000, "the quick brown fox jumps over the lazy dog and the"
              " plain rain in spain stays mainly on the plain"),
    (3100001, "wombat zigzag quixotic jukebox flummox syzygy"),
    (3100002, "partition shuffle broadcast window aggregate stream the"
              " spark plan codegen 12345 mixed99words"),
    (3100003, ""),
]


def text_bpe_encode(spark, sf):
    """REAL BPE token accounting (functions/bpe.py — Sennrich merges,
    one-at-a-time leftmost-lowest-rank apply, provably == standard BPE)
    plus token-level sequence packing over the resulting budget column
    (pack_sequences, context 256, scale_safe sharded prefix sum): the
    per-doc columns a training-data writer needs. The merge table is
    the fixed demo vocab (trained once on an embedded seed text) so the
    DuckDB twin can inline it as VALUES and replay the SAME algorithm
    as a recursive CTE — a full independent reimplementation, not a
    stored answer."""
    from delver_spark.functions import bpe as _bpe
    from delver_spark.operators.assemble import pack_sequences

    # NULL-text docs are excluded in BOTH engines: token_counts emits
    # NULL counts for them by contract, but the twin's aggregation
    # would coalesce to 0 and the packing window would then diverge —
    # the gate must be well-defined on any corpus, not just one with
    # zero NULL texts (r5 review finding)
    d = (_t(spark, sf, "documents").select("doc_id", "text")
         .filter(F.col("text").isNotNull()))
    planted = spark.createDataFrame(_BPE_DOCS, "doc_id long, text string")
    counts = _bpe.token_counts(d.unionByName(planted), _bpe.demo_merges())
    return pack_sequences(counts, "n_bpe_tokens", "doc_id", 256,
                          scale_safe=True).orderBy("doc_id")


def _bpe_encode_sql() -> str:
    """The DuckDB twin of text_bpe_encode: the same fixed merge table
    (inlined as VALUES) applied by an independent recursive-CTE
    reimplementation of the one-at-a-time leftmost-lowest-rank loop —
    each recursion step merges exactly one pair occurrence, words with
    no applicable merge fall out of the working set, and the final
    token count per word is min(len(toks)) over the accumulated states
    (each step shrinks the list by one). rank*100000 + i encodes the
    (rank, position) argmin; valid while words are < 100000 chars and
    merge count < 21474 (int32 bound) — demo vocab is 89 merges."""
    from delver_spark.functions import bpe as _bpe

    merges = _bpe.merges_values_sql(_bpe.demo_merges())
    planted = ", ".join(f"({i}, '{t}')" for i, t in _BPE_DOCS)
    return f"""
        WITH RECURSIVE
        merges(l, r, rank) AS (SELECT * FROM (VALUES {merges}) m(l, r, rank)),
        docs AS (
          SELECT doc_id, text FROM documents WHERE text IS NOT NULL
          UNION ALL SELECT * FROM (VALUES {planted}) p(doc_id, text)),
        words AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(text, '{_bpe.WORD_PATTERN}')) AS w
          FROM docs),
        wc AS (SELECT doc_id, w, count(*) AS cnt FROM words GROUP BY doc_id, w),
        uniq AS (SELECT DISTINCT w FROM wc),
        bpe(w, toks) AS (
          SELECT w, string_split(w, '') FROM uniq
          UNION ALL
          SELECT w, toks[1:(best % 100000) - 1]
                    || [toks[best % 100000] || toks[(best % 100000) + 1]]
                    || toks[(best % 100000) + 2:]
          FROM (SELECT b.w, any_value(b.toks) AS toks,
                       min(m.rank * 100000 + u.i) AS best
                FROM bpe b,
                     unnest(generate_series(1, len(b.toks) - 1)) AS u(i)
                JOIN merges m
                  ON m.l = b.toks[u.i] AND m.r = b.toks[u.i + 1]
                GROUP BY b.w)),
        wlen AS (SELECT w, min(len(toks)) AS n_toks FROM bpe GROUP BY w),
        counts AS (
          SELECT d.doc_id,
                 CAST(coalesce(sum(wc.cnt), 0) AS BIGINT) AS n_words,
                 CAST(coalesce(sum(wc.cnt * wlen.n_toks), 0) AS BIGINT)
                   AS n_bpe_tokens
          FROM docs d
          LEFT JOIN wc ON wc.doc_id = d.doc_id
          LEFT JOIN wlen ON wlen.w = wc.w
          GROUP BY d.doc_id),
        packed AS (
          SELECT doc_id, n_words, n_bpe_tokens,
                 CAST(coalesce(sum(n_bpe_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS c
          FROM counts)
        SELECT doc_id, n_words, n_bpe_tokens,
               c // 256 AS seq_first,
               (c + greatest(n_bpe_tokens, 1) - 1) // 256 AS seq_last,
               c % 256 AS offset_in_seq
        FROM packed ORDER BY doc_id
    """


_BPE_ENCODE_SQL = _bpe_encode_sql()


# Planted multi-line / PII documents: the driver tables are single-line
# word salad with no PII, so the repetition and scrub gates need
# deterministic plants to be non-vacuous (same pattern as
# _planted_embeddings / the doc_fingerprint short doc). No quotes or
# backslashes in the strings, so they embed verbatim in the DuckDB twin
# VALUES lists (the \n becomes a literal newline inside the SQL string,
# which DuckDB accepts).
_REP_DOCS = [
    (2000000, "alpha beta\nalpha beta\ngamma delta\nalpha beta\nepsilon"),
    (2000001, "spam spam spam spam spam ham"),
    (2000002, "clean line one\nclean line two\nclean line three"),
]
_PII_DOCS = [
    (2000000, "contact alice.smith@example.test for account help"),
    (2000001, "call 555-123-4567 or 555.987.6543 before noon"),
    (2000002, "escalate to bob@mail.example.test or 321-654-0987"),
    (2000003, "local part 123.456.7890@relay.example.test is one email"),
]


def _values_sql(rows):
    return ", ".join(f"({i}, '{t}')" for i, t in rows)


def text_repetition_filters(spark, sf):
    """Gopher-style repetition keep/drop filters over documents plus
    planted multi-line docs (testdata text has no newlines, so the
    line-duplication branch needs plants to be exercised)."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(_REP_DOCS, "doc_id long, text string")
    return _txt.repetition_stats(d.unionByName(planted))


def text_pii_scrub(spark, sf):
    """Email/phone PII counting + redaction over documents plus planted
    PII docs (testdata text has no PII; plants cover multi-hit rows and
    the phone-shaped-email-local-part single-count case)."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(_PII_DOCS, "doc_id long, text string")
    return _txt.pii_scrub(d.unionByName(planted))


def decontaminate_ngram(spark, sf):
    """Benchmark decontamination: flag documents sharing any word 5-gram
    with a benchmark set (docs with doc_id % 37 == 0 stand in for the
    eval suite, so self-matches guarantee a non-vacuous gate and shared
    word-salad 5-grams exercise cross-document hits). Tagged union of
    the two exact plans (r5-s5, same 50-slot policy as x14+o6):
    'bcast' = the gram set rides the UDF closure (eval-suite-sized
    benches); 'bloom' = treeAggregate-built Bloom screen + exact verify
    join (benches past the broadcast bound) — identical output by
    contract, so ONE hits CTE serves both tags in the twin."""
    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 37 == 0)
    bcast = (_txt.ngram_decontaminate(d, bench, n=5)
             .withColumn("method", F.lit("bcast")))
    bloom = (_txt.ngram_decontaminate_bloom(d, bench, n=5)
             .withColumn("method", F.lit("bloom")))
    cols = ["method", "doc_id", "n_hits", "contaminated"]
    return (bcast.select(cols).unionByName(bloom.select(cols))
            .orderBy("method", "doc_id"))


def set_ops_union_except(spark, sf):
    """§2.6 set ops (union distinct + except) in ONE tagged driver entry —
    consolidated from the r3 separate set_union_nations /
    set_except_unshipped entries (the x14+o6 50-slot move) to free a
    gate slot for the round-4 training-data operators."""
    u = (set_union_nations(spark, sf)
         .select(F.lit("union_nations").alias("op"),
                 F.col("nationkey").cast("long").alias("key")))
    x = (set_except_unshipped(spark, sf)
         .select(F.lit("except_unshipped").alias("op"),
                 F.col("orderkey").cast("long").alias("key")))
    return u.unionByName(x).orderBy("op", "key")


def f4_f9_filter_gates(spark, sf):
    """F4 null filter + F9 content-type gate in ONE tagged driver entry
    (both one-predicate filters; consolidated to free a gate slot)."""
    a = f4_null_filter(spark, sf).select(
        F.lit("f4_null").alias("gate"),
        F.col("r_regionkey").cast("long").alias("key"),
        F.col("r_name").alias("val"))
    b = f9_content_type_gate(spark, sf).select(
        F.lit("f9_content_type").alias("gate"),
        F.col("doc_id").cast("long").alias("key"),
        F.col("source").alias("val"))
    return a.unionByName(b).orderBy("gate", "key")


def a1_a4_metric_rollups(spark, sf):
    """A1 date-histogram rollup + A4 first-occurrence dedupe in ONE
    tagged driver entry (consolidated to free a gate slot for
    dedup_duplicate_spans; -1 sentinels instead of NULLs keep the
    pandas dtypes integral on both engines)."""
    a = a1_metric_date_histogram(spark, sf).select(
        F.lit("a1_histogram").alias("op"), F.col("day").alias("k1"),
        F.col("event_type").alias("k2"), F.col("n").cast("string").alias("k3"),
        F.col("value_sum_milli").alias("n1"),
        F.col("value_avg_milli").alias("d1"))
    b = a4_dedupe_first_occurrence(spark, sf).select(
        F.lit("a4_first").alias("op"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("event_id").cast("string").alias("k2"),
        F.col("ts_s").alias("k3"),
        F.lit(-1).cast("long").alias("n1"),
        F.lit(-1.0).alias("d1"))
    return a.unionByName(b).orderBy("op", "k1", "k2")


# planted passages for the duplicate-spans gate: two docs sharing a
# 10-word passage with different surroundings + one doc with an
# intra-doc repeat (same VALUES-embedding constraints as _REP_DOCS)
_SPAN_PASSAGE = "the quick brown fox jumps over the lazy dog tonight"
_SPAN_DOCS = [
    (3000000, "intro words here " + _SPAN_PASSAGE + " closing remarks now"),
    (3000001, "different opening stanza " + _SPAN_PASSAGE + " and a tail"),
    (3000002, "loop alpha beta gamma delta epsilon zeta eta theta"
              " loop alpha beta gamma delta epsilon zeta eta theta"),
]


def dedup_duplicate_spans(spark, sf):
    """Exact substring-level dedup (dedup.duplicate_spans): maximal
    repeated-passage spans over documents + planted shared/intra-doc
    passages. window=4 so the small-vocab word salad also produces
    organic cross-document hits alongside the plants."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(_SPAN_DOCS, "doc_id long, text string")
    return _dedup.duplicate_spans(d.unionByName(planted), window=4)


def f6_j5_fanout_ops(spark, sf):
    """F6 same-domain split + J5 stream×filter cross product in ONE
    tagged driver entry (consolidated to free a gate slot)."""
    a = f6_same_domain_split(spark, sf).select(
        F.lit("f6_split").alias("op"), F.col("branch").alias("a"),
        F.col("n").cast("string").alias("b"))
    b = j5_stream_filter_cross(spark, sf).select(
        F.lit("j5_cross").alias("op"), F.col("r_name").alias("a"),
        F.col("o_orderstatus").alias("b"))
    return a.unionByName(b).orderBy("op", "a", "b")


def sample_deterministic(spark, sf):
    """Reproducible hash-rate down-sampling (training-data ablations):
    keep ~10% of documents by md5(doc_id) bucket — same rows on every
    engine/run/partitioning, unlike rand(seed)."""
    d = _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return _txt.deterministic_sample(d, rate_milli=100).orderBy("doc_id")


def sample_language_quota(spark, sf):
    """Per-language balancing quota: top 25 documents per language by
    n_chars (ties on doc_id) — the mixing step of a multilingual
    training-set assembly. salt_buckets=4 routes the driver gate through
    the salted two-phase pre-cut (identical output to the plain window,
    skew-safe plan — the same exercise-the-scale-path trick as
    dedup_minhash_lsh's bucket_cap)."""
    return _txt.language_quota(_t(spark, sf, "documents"), per_lang=25,
                               salt_buckets=4)


#: gate mixture weights — fr deliberately ABSENT so the gate exercises
#: the default_milli=0 drop branch in both engines
_MIX_RATES = {"en": 400, "de": 800, "es": 200, "zh": 100}


#: gate upsample weights — en gets 2 full epochs + a 100-milli
#: fractional epoch, zh 1 full + 400 milli; others default-dropped
_UP_RATES = {"en": 2100, "zh": 1400}


def sample_ops(spark, sf):
    """Deterministic hash-rate sampling + per-language quota +
    per-language mixture weighting + epoch upsampling (rates > 1.0,
    r5-s10) + seeded global shuffle order (r5-s10, the
    pack-decorrelation step — rank in the md5-seeded permutation via
    assign_global_rank, twin = one SQL window) in ONE tagged driver
    entry (consolidated r5-s9 to free a gate slot, same 50-slot policy
    as x14+o6). The union's (op, doc_id) key is no longer unique
    (upsampled epochs), so the total order adds v1."""
    a = sample_deterministic(spark, sf).select(
        F.lit("det").alias("op"), "doc_id", "lang",
        F.col("n_chars").cast("long").alias("v1"),
        F.lit(-1).cast("long").alias("v2"))
    b = sample_language_quota(spark, sf).select(
        F.lit("quota").alias("op"), "doc_id", "lang",
        F.col("quality").cast("long").alias("v1"),
        F.col("lang_rank").cast("long").alias("v2"))
    c = _txt.mixture_sample(_t(spark, sf, "documents"), _MIX_RATES).select(
        F.lit("mix").alias("op"), "doc_id", "lang",
        F.col("n_chars").cast("long").alias("v1"),
        F.lit(-1).cast("long").alias("v2"))
    d = _txt.deterministic_split(
        _t(spark, sf, "documents"),
        {"val": 50, "test": 50, "train": 900}).select(
        F.concat(F.lit("split_"), F.col("split")).alias("op"),
        "doc_id", "lang",
        F.col("n_chars").cast("long").alias("v1"),
        F.lit(-1).cast("long").alias("v2"))
    e = _txt.mixture_upsample(_t(spark, sf, "documents"),
                              _UP_RATES).select(
        F.lit("up").alias("op"), "doc_id", "lang",
        F.col("epoch").cast("long").alias("v1"),
        F.col("n_chars").cast("long").alias("v2"))
    from delver_spark.operators.assemble import shuffle_order
    g = shuffle_order(_t(spark, sf, "documents"), seed=3).select(
        F.lit("shuf").alias("op"), "doc_id", "lang",
        F.col("shuffle_rank").cast("long").alias("v1"),
        F.col("n_chars").cast("long").alias("v2"))
    return a.unionByName(b).unionByName(c).unionByName(d) \
        .unionByName(e).unionByName(g).orderBy("op", "doc_id", "v1")


def export_webdataset_manifest(spark, sf):
    """REAL WebDataset tar-shard export of the documents table (one
    ``{doc_id}.txt`` member per doc, 64 KiB fixed-range shards) — the
    gate compares the manifest built from the ACTUAL written tar file
    sizes against the DuckDB twin's pure integer ustar arithmetic
    (member = 512-byte header + utf-8 payload padded to 512; archive =
    members + 1024 end bytes padded to the 10240 record size). Storage
    order of documents.parquet is doc_id-ascending (verified; the twin
    orders by doc_id). Tar bytes themselves are pinned vs a stdlib
    tarfile reference in tests/test_webdataset.py."""
    import os
    import shutil
    import tempfile

    from delver_spark.operators.webdataset import export_webdataset

    # fixed per-sf dir, recreated each run — a fresh mkdtemp per
    # invocation would accrete a tar copy of the documents table in
    # /tmp on every gate/bench/test run (r5-s9 review finding)
    out = os.path.join(tempfile.gettempdir(),
                       "delver_wds_gate_" + os.path.basename(
                           sf.rstrip("/") or "sf"))
    shutil.rmtree(out, ignore_errors=True)
    return export_webdataset(
        spark, os.path.join(sf, "documents.parquet"), out, 65536,
        key_col="doc_id", data_col="text", fmt_col=None, ext="txt",
        caption_col=None)


def dedup_simhash16(spark, sf):
    """16-bit md5-based SimHash signature per document."""
    return _dedup.simhash16(_t(spark, sf, "documents"))


def dedup_embedding_cosine(spark, sf):
    """Embedding-cosine near-dup pairs (int-quantized, cos >= 0.95) over
    the planted-near-dup union (non-empty driver gate; the operator
    itself is the declared small-N all-pairs oracle twin)."""
    return _dedup.embedding_cosine_pairs(_planted_embeddings(spark, sf))


# shared CTE body: DF-capped candidate generation + exact full-set verify
# (the dedup_ngram_jaccard twin; dedup_components builds its edge list
# from the same body so the two stay in lockstep)
_NGRAM_CORE_SQL = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] AS shingle
      FROM toks, unnest(generate_series(1, len(ts)-1)) AS g(i)),
    rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      WHERE a.shingle IN (SELECT shingle FROM rare)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS inter
      FROM cand c JOIN sh a ON a.doc_id = c.doc_a
                  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY c.doc_a, c.doc_b)
    SELECT doc_a, doc_b, inter,
           CAST(round(inter * 1000.0 / (sa.sz + sb.sz - inter)) AS BIGINT) AS jacc_milli
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(round(inter * 1000.0 / (sa.sz + sb.sz - inter)) AS BIGINT) >= 300
"""


# shared CTE body: quantized embedding components + planted near-dups
# (mirrors _planted_embeddings: copy at vec_id + 10^6, ONE sign-flipped
# dimension at index vec_id % 64; negation after quantization == negation
# before it, since round-half-away-from-zero is sign-symmetric in both
# engines). Used by the dedup_embedding_cosine and dedup_embedding_lsh
# twins so the two stay in lockstep.
_PLANTED_EX_SQL = """
    ex0 AS (
      SELECT vec_id, i,
             CAST(round(CAST(embedding[i] AS DOUBLE)*1000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
    ex AS (
      SELECT vec_id, i, val FROM ex0
      UNION ALL
      SELECT orig + 1000000 AS vec_id, i,
             CASE WHEN i - 1 = orig % 64 THEN -val ELSE val END AS val
      FROM (SELECT vec_id AS orig, i, val FROM ex0 WHERE vec_id % 4 = 0))
"""


# connected components over the ngram-Jaccard pair list (reachability as
# a recursive CTE) — shared verbatim by dedup_components (min-label) and
# dedup_components_star (large-star/small-star), which must agree.
_COMPONENTS_SQL = f"""
    WITH RECURSIVE p AS ({_NGRAM_CORE_SQL}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b, doc_a FROM p),
    gnodes AS (SELECT DISTINCT a AS n FROM edges),
    reach AS (
      SELECT n, n AS m FROM gnodes
      UNION
      SELECT r.n, e.b AS m FROM reach r JOIN edges e ON e.a = r.m)
    SELECT n AS doc_id, min(m) AS component
    FROM reach GROUP BY n ORDER BY doc_id
"""

# dedup_components_ops twin: one component map (the CTE above), tagged
# twice — the Spark side unions the min-label and star plans, which
# must agree row-for-row, so the twin IS the same map under both tags.
_COMPONENTS_OPS_SQL = f"""
    WITH RECURSIVE p AS ({_NGRAM_CORE_SQL}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b, doc_a FROM p),
    gnodes AS (SELECT DISTINCT a AS n FROM edges),
    reach AS (
      SELECT n, n AS m FROM gnodes
      UNION
      SELECT r.n, e.b AS m FROM reach r JOIN edges e ON e.a = r.m),
    comp AS (SELECT n AS doc_id, min(m) AS component
             FROM reach GROUP BY n)
    SELECT doc_id, component, method
    FROM comp CROSS JOIN (SELECT unnest(['minlabel', 'star']) AS method)
    ORDER BY method, doc_id
"""

# semdedup twin: the planted-embeddings explosion WITH the inherited
# label (cluster), per-cell integer centroid sums, within-cell pair
# cosines, reachability components, keeper = (cent_cos_milli ASC,
# vec_id ASC). Norm products cast to DOUBLE BEFORE multiplying — the
# exact form the Spark plan uses (see operators/dedup.py:semdedup).
_SEMDEDUP_SQL = """
    WITH RECURSIVE exl0 AS (
      SELECT vec_id, label, i,
             CAST(round(CAST(embedding[i] AS DOUBLE)*1000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
    exl AS (
      SELECT vec_id, label, i, val FROM exl0
      UNION ALL
      SELECT orig + 1000000 AS vec_id, label, i,
             CASE WHEN i - 1 = orig % 64 THEN -val ELSE val END AS val
      FROM (SELECT vec_id AS orig, label, i, val FROM exl0
            WHERE vec_id % 4 = 0)),
    cells AS (SELECT DISTINCT vec_id, label FROM exl),
    norms AS (SELECT vec_id, CAST(sum(val*val) AS BIGINT) AS nm
              FROM exl GROUP BY vec_id),
    cent AS (SELECT label, i, CAST(sum(val) AS BIGINT) AS s
             FROM exl GROUP BY label, i),
    cnorm AS (SELECT label, sum(CAST(s AS HUGEINT) * s) AS nc
              FROM cent GROUP BY label),
    cdot AS (SELECT e.vec_id, CAST(sum(e.val * c.s) AS BIGINT) AS d
             FROM exl e JOIN cent c ON c.label = e.label AND c.i = e.i
             GROUP BY e.vec_id),
    scored AS (
      SELECT cl.vec_id, cl.label,
             CAST(round(d * 1000.0 / sqrt(CAST(nm AS DOUBLE)
                                          * CAST(nc AS DOUBLE)))
                  AS BIGINT) AS cent_cos_milli
      FROM cells cl
      JOIN cdot ON cdot.vec_id = cl.vec_id
      JOIN norms ON norms.vec_id = cl.vec_id
      JOIN cnorm ON cnorm.label = cl.label),
    dots AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             CAST(sum(a.val*b.val) AS BIGINT) AS dot
      FROM exl a JOIN exl b
        ON a.label = b.label AND a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY doc_a, doc_b),
    p AS (
      SELECT doc_a, doc_b
      FROM dots JOIN norms na ON na.vec_id = doc_a
                JOIN norms nb ON nb.vec_id = doc_b
      WHERE CAST(round(dot * 1000.0 / sqrt(CAST(na.nm AS DOUBLE)
                                           * CAST(nb.nm AS DOUBLE)))
                 AS BIGINT) >= 950),
    edges AS (
      SELECT doc_a AS a2, doc_b AS b2 FROM p
      UNION SELECT doc_b, doc_a FROM p),
    gnodes AS (SELECT DISTINCT a2 AS n FROM edges),
    reach AS (
      SELECT n, n AS m FROM gnodes
      UNION
      SELECT r.n, e.b2 AS m FROM reach r JOIN edges e ON e.a2 = r.m),
    comp AS (SELECT n AS vec_id, min(m) AS component
             FROM reach GROUP BY n),
    labeled AS (
      SELECT s.vec_id, s.label,
             coalesce(c.component, s.vec_id) AS component,
             s.cent_cos_milli
      FROM scored s LEFT JOIN comp c ON c.vec_id = s.vec_id),
    win AS (
      SELECT component, vec_id AS keeper,
             row_number() OVER (PARTITION BY component
                                ORDER BY cent_cos_milli ASC, vec_id ASC)
               AS rn
      FROM labeled)
    SELECT * FROM (
      SELECT l.vec_id, l.label, l.component, l.cent_cos_milli,
             l.vec_id = w.keeper AS keep
      FROM labeled l JOIN win w ON w.component = l.component AND w.rn = 1
      UNION ALL
      -- NULL-label (unclustered) vectors: explicit singletons, same
      -- rule as the engine (dedup.py:semdedup r5 review fix)
      SELECT vec_id, label, vec_id AS component,
             CAST(NULL AS BIGINT) AS cent_cos_milli, TRUE AS keep
      FROM cells WHERE label IS NULL)
    ORDER BY vec_id
"""


def _kmeans_cells_sql(k: int, n_iter: int) -> str:
    """Generated twin for similarity.kmeans_cells: the same Lloyd's
    iterations UNROLLED (iteration count is a compile-time constant of
    the gate query, so each assignment/update round is its own CTE
    block — no recursion needed). Exactness matches the Spark plan
    operation for operation: integer milli quantization, exact BIGINT
    dots, ranking by ``sign(d)·f64(d)·f64(d)/f64(‖c‖²)`` with ties →
    lowest cell (the plan's np.argmax-first-max), init = the k
    lowest-id vectors as cells 0..k-1, empty cells keep their previous
    centroid."""
    score = ("CASE WHEN n.ns > 0 THEN "
             "(CASE WHEN d.d < 0 THEN -1.0 ELSE 1.0 END)"
             " * CAST(d.d AS DOUBLE) * CAST(d.d AS DOUBLE)"
             " / CAST(n.ns AS DOUBLE) "
             "ELSE CAST('-infinity' AS DOUBLE) END")
    parts = [f"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
          FROM embeddings),
        ex AS (
          SELECT vec_id, i, qv[i] AS val
          FROM q, unnest(generate_series(1, len(qv))) AS g(i)),
        c0 AS (
          SELECT init.cell, ex.i, CAST(ex.val AS BIGINT) AS s
          FROM (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cell
                FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT {k})) init
          JOIN ex ON ex.vec_id = init.vec_id),
        n0 AS (SELECT cell, CAST(sum(s*s) AS BIGINT) AS ns FROM c0 GROUP BY cell)"""]
    for t in range(n_iter + 1):
        parts.append(f""",
        d{t} AS (
          SELECT ex.vec_id, c.cell, CAST(sum(ex.val * c.s) AS BIGINT) AS d
          FROM ex JOIN c{t} c ON c.i = ex.i GROUP BY ex.vec_id, c.cell),
        a{t} AS (
          SELECT vec_id, cell FROM (
            SELECT d.vec_id, d.cell,
                   row_number() OVER (PARTITION BY d.vec_id
                                      ORDER BY {score} DESC, d.cell ASC) AS rn
            FROM d{t} d JOIN n{t} n ON n.cell = d.cell) WHERE rn = 1)""")
        if t < n_iter:
            parts.append(f""",
        u{t + 1} AS (
          SELECT a.cell, ex.i, CAST(sum(ex.val) AS BIGINT) AS s
          FROM a{t} a JOIN ex ON ex.vec_id = a.vec_id GROUP BY a.cell, ex.i),
        c{t + 1} AS (
          SELECT cell, i, s FROM u{t + 1}
          UNION ALL
          SELECT cell, i, s FROM c{t}
          WHERE cell NOT IN (SELECT DISTINCT cell FROM u{t + 1})),
        n{t + 1} AS (SELECT cell, CAST(sum(s*s) AS BIGINT) AS ns
                     FROM c{t + 1} GROUP BY cell)""")
    parts.append(f"""
        SELECT vec_id, cell AS label FROM a{n_iter} ORDER BY vec_id""")
    return "".join(parts)


# dedup resolution twin: the components reachability body + winner
# selection (max n_chars, ties → min doc_id) + keep flags for every
# document (left join; singletons are their own component)
_RESOLVE_SQL = f"""
    WITH RECURSIVE p AS ({_NGRAM_CORE_SQL}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b, doc_a FROM p),
    gnodes AS (SELECT DISTINCT a AS n FROM edges),
    reach AS (
      SELECT n, n AS m FROM gnodes
      UNION
      SELECT r.n, e.b AS m FROM reach r JOIN edges e ON e.a = r.m),
    comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
    labeled AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
             d.n_chars
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
    win AS (
      SELECT component, doc_id AS canonical_id,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM labeled)
    SELECT l.doc_id, l.component, w.canonical_id,
           l.doc_id = w.canonical_id AS keep
    FROM labeled l JOIN win w ON w.component = l.component AND w.rn = 1
    ORDER BY l.doc_id
"""


# aspect-bucket twin: boundary/dimension constants come from the SAME
# helper the operator uses, so the two can't drift
from delver_spark.operators.multimodal import (  # noqa: E402
    SDXL_BUCKETS as _AB_BUCKETS,
    bucket_boundaries_milli as _ab_bounds,
)

_AB_BOUND_SQL = " + ".join(
    f"(CASE WHEN (w * 1000) // h >= {b} THEN 1 ELSE 0 END)"
    for b in _ab_bounds(_AB_BUCKETS))
_AB_WS = ", ".join(str(w) for w, _ in _AB_BUCKETS)
_AB_HS = ", ".join(str(h) for _, h in _AB_BUCKETS)
_IMAGE_BUCKET_SQL = f"""
    WITH m AS (
      SELECT doc_id,
             64 + (doc_id * 7919) % 1984 AS w,
             64 + (doc_id * 104729) % 1984 AS h
      FROM documents),
    b AS (
      SELECT doc_id, w, h,
             CAST({_AB_BOUND_SQL} AS BIGINT) AS bucket_id
      FROM m),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY bucket_id
                                   ORDER BY doc_id) - 1 AS rk
      FROM b)
    SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
           bucket_id,
           CAST([{_AB_WS}][CAST(bucket_id AS INT) + 1] AS BIGINT) AS bucket_w,
           CAST([{_AB_HS}][CAST(bucket_id AS INT) + 1] AS BIGINT) AS bucket_h,
           CAST(rk // 16 AS BIGINT) AS batch_idx,
           CAST(rk % 16 AS BIGINT) AS slot
    FROM r ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# f8 oracle twin: the news.go blacklists expanded into SQL
# ---------------------------------------------------------------------------

from delver_spark.functions.news import (  # noqa: E402
    BLACKLISTED_EXTENSIONS as _NEWS_EXTS,
    BLACKLISTED_PATHS as _NEWS_PATHS,
)

_EXT_SQL = " OR ".join(f"ends_with(path, '{e}')" for e in _NEWS_EXTS)
_BL_SQL = " OR ".join(f"contains(first_tok, '{b}')" for b in _NEWS_PATHS)
_F8_NEWS_SQL = f"""
    WITH synth AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '')[1] AS ft,
             source
      FROM documents),
    p AS (
      SELECT doc_id,
             CASE CAST(doc_id % 5 AS INT)
               WHEN 0 THEN '/article/' || ft || '-' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/tag/' || ft
               WHEN 2 THEN '/' || ft || '/' || repeat('x', 25)
               WHEN 3 THEN '/img/pic-' || CAST(doc_id AS VARCHAR) || '.jpg'
               ELSE '/article/x:1=2' END AS path,
             CASE WHEN doc_id % 7 = 0 THEN 'other.test'
                  ELSE 'news.' || source || '.test' END AS host,
             'news.' || source || '.test' AS origin_host
      FROM synth),
    u AS (
      SELECT doc_id, path, host, origin_host,
             list_filter(string_split(path, '/'), x -> x <> '') AS toks
      FROM p),
    v AS (
      SELECT doc_id, path, host, origin_host, toks,
             toks[1] AS first_tok,
             len(list_filter(toks, x -> length(x) > 20)) > 0 AS has_long
      FROM u)
    SELECT doc_id, path,
           (host = origin_host)
           AND NOT ({_EXT_SQL})
           AND (CASE WHEN len(toks) = 0 THEN FALSE
                     WHEN contains(first_tok, 'article') THEN TRUE
                     WHEN NOT has_long THEN FALSE
                     WHEN {_BL_SQL} THEN FALSE
                     ELSE TRUE END)
           AND NOT (contains(path, ':') AND contains(path, '='))
           AS admitted
    FROM v ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------
# Stable-name policy (VERDICT r3 #1): the driver CORRECTNESS gate caps at
# 50 rows, so this dict holds EXACTLY 50 entries — every key gets a row
# every round. New operators earn a slot by consolidating two trivial
# existing entries into one tagged union (history: x14+o6 and x11+x12 in
# early r4; set_union+set_except, f4+f9, f6+j5, a5+a6, o3+f10 later in
# r4). Keys are
# otherwise never renamed; the underlying single-op functions stay
# defined and callable for tests/SURVEY references.

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "o1_fifo_dequeue": o1_fifo_dequeue,
    "o2_politeness_window": o2_politeness_window,
    "o3_f10_search_ops": o3_f10_search_ops,
    "o4_refill_pick": o4_refill_pick,
    "a1_a4_metric_rollups": a1_a4_metric_rollups,
    "a2_tumbling_window_mean": a2_tumbling_window_mean,
    "a5_a6_extract_rollups": a5_a6_extract_rollups,
    "image_bucket_batches": image_bucket_batches,
    "j1_payload_lookup": j1_payload_lookup,
    "j2_robots_lookup": j2_robots_lookup,
    "j3_seen_anti_join": j3_seen_anti_join,
    "j4_unvisited_semi_join": j4_unvisited_semi_join,
    "f2_multi_filter": f2_multi_filter,
    "f3_regex_filter": f3_regex_filter,
    "f4_f9_filter_gates": f4_f9_filter_gates,
    "f6_j5_fanout_ops": f6_j5_fanout_ops,
    "f8_news_admission": f8_news_admission,
    "pack_training_shards": pack_training_shards,
    "set_ops_union_except": set_ops_union_except,
    "x11_x12_scalar_fns": x11_x12_scalar_fns,
    "x13_json_extract": x13_json_extract,
    "x14_o6_scalar_fns": x14_o6_scalar_fns,
    "t2_stream_composite_filter": t2_stream_composite_filter,
    "dedup_exact": dedup_exact,
    "dedup_simhash16": dedup_simhash16,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_verified": dedup_minhash_verified,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "dedup_components_ops": dedup_components_ops,
    "dedup_semdedup": dedup_semdedup,
    "dedup_phash_hamming": dedup_phash_hamming,
    "dedup_resolve_canonical": dedup_resolve_canonical,
    "dedup_duplicate_spans": dedup_duplicate_spans,
    "ann_topk_ops": ann_topk_ops,
    "ann_kmeans_cells": ann_kmeans_cells,
    "ann_ivf_nprobe": ann_ivf_nprobe,
    "sample_ops": sample_ops,
    "export_webdataset_manifest": export_webdataset_manifest,
    "text_token_ops": text_token_ops,
    "text_bpe_encode": text_bpe_encode,
    "text_quality_ops": text_quality_ops,
    "text_lm_score": text_lm_score,
    "doc_fingerprint": doc_fingerprint,
    "text_repetition_filters": text_repetition_filters,
    "text_pii_scrub": text_pii_scrub,
    "decontaminate_ngram": decontaminate_ngram,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the politeness-dequeue window (the crawl engine's O1/O2
    operator) over sf0.001."""
    return o2_politeness_window(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                   CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, orderdate
            ORDER BY revenue_cents DESC, orderdate, l_orderkey LIMIT 10
        """,
        "o1_fifo_dequeue": """
            SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type
            FROM events ORDER BY ts, event_id LIMIT 500
        """,
        "o2_politeness_window": """
            SELECT user_id, event_id, host_rank, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS host_rank
                  FROM events) WHERE host_rank <= 3
            ORDER BY ts, event_id LIMIT 200
        """,
        "o3_f10_search_ops": """
            SELECT * FROM (
              SELECT 'o3_order' AS op, CAST(event_id AS VARCHAR) AS k1,
                     strftime(ts, '%Y-%m-%d %H:%M:%S') AS k2,
                     CAST(user_id AS BIGINT) AS n
              FROM (SELECT * FROM events ORDER BY ts, event_id LIMIT 10000)
              UNION ALL
              SELECT 'f10_projection', CAST(doc_id AS VARCHAR), lang,
                     CAST(n_chars AS BIGINT)
              FROM documents
            ) ORDER BY op, k1
        """,
        "o4_refill_pick": """
            SELECT min(source) AS first_source
            FROM (SELECT source, count(*) AS c FROM documents GROUP BY source HAVING c > 10)
        """,
        "a1_a4_metric_rollups": """
            SELECT 'a1_histogram' AS op,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS k1,
                   event_type AS k2,
                   CAST(count(*) AS VARCHAR) AS k3,
                   CAST(sum(CAST(round(value*1000) AS BIGINT)) AS BIGINT) AS n1,
                   CAST(sum(CAST(round(value*1000) AS BIGINT)) AS DOUBLE)/count(*) AS d1
            FROM events GROUP BY k1, k2
            UNION ALL
            SELECT 'a4_first', CAST(user_id AS VARCHAR),
                   CAST(event_id AS VARCHAR),
                   strftime(ts, '%Y-%m-%d %H:%M:%S'),
                   CAST(-1 AS BIGINT), -1.0
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS rn
                  FROM events) WHERE rn = 1
            ORDER BY op, k1, k2
        """,
        "a2_tumbling_window_mean": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
                   CAST(sum(CAST(round(value*1000) AS BIGINT)) AS BIGINT) AS value_sum_milli,
                   count(*) AS n,
                   min(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS min_ts
            FROM events GROUP BY hour ORDER BY hour
        """,
        "a5_a6_extract_rollups": """
            SELECT * FROM (
              SELECT 'a5_explosion' AS op, CAST(c_nationkey AS VARCHAR) AS key,
                     CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n,
                     count(DISTINCT c_mktsegment) >= 5 AS flag
              FROM customer GROUP BY c_nationkey
              UNION ALL
              SELECT 'a6_pairs' AS op, a.p_type AS key,
                     CAST(count(*) AS BIGINT) AS n, FALSE AS flag
              FROM part a JOIN part b ON a.p_type = b.p_type AND a.p_size = b.p_size + 1
              GROUP BY a.p_type
            ) ORDER BY op, key
        """,
        "image_bucket_batches": _IMAGE_BUCKET_SQL,
        "j1_payload_lookup": """
            SELECT o_orderkey, c_name, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_totalprice > 400000 ORDER BY o_orderkey
        """,
        "j2_robots_lookup": """
            SELECT s_name, count(*) AS n_lines,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_sum
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_name ORDER BY s_name
        """,
        "j3_seen_anti_join": """
            SELECT o_orderkey FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
            ORDER BY o_orderkey
        """,
        "j4_unvisited_semi_join": """
            SELECT s_suppkey, s_name FROM supplier
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
            ORDER BY s_suppkey
        """,
        "f6_j5_fanout_ops": """
            SELECT 'f6_split' AS op,
                   CASE WHEN c_nationkey = 7 AND o_totalprice < 300000
                        THEN 'enqueue' ELSE 'stash' END AS a,
                   CAST(count(*) AS VARCHAR) AS b
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY a
            UNION ALL
            SELECT 'j5_cross', r_name, o_orderstatus
            FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
            ORDER BY op, a, b
        """,
        "f2_multi_filter": """
            SELECT p_partkey, p_name, p_size FROM part
            WHERE regexp_matches(p_name, 'red') AND p_size BETWEEN 10 AND 30
              AND p_brand IN ('Brand#11','Brand#22','Brand#3')
            ORDER BY p_partkey
        """,
        "f4_f9_filter_gates": """
            SELECT 'f4_null' AS gate, CAST(r_regionkey AS BIGINT) AS key,
                   r_name AS val
            FROM region WHERE TRUE
            UNION ALL
            SELECT 'f9_content_type', doc_id, source
            FROM documents WHERE source LIKE '%1%'
            ORDER BY gate, key
        """,
        "x14_o6_scalar_fns": """
            SELECT n_nationkey,
                   base64(encode(lower(replace(n_name,' ','')) || '.test')) AS host_b64,
                   n_name = (SELECT min(n_name) FROM nation) AS is_first_by_name
            FROM nation ORDER BY n_nationkey
        """,
        "f3_regex_filter": """
            SELECT p_partkey, p_name FROM part
            WHERE regexp_matches(p_name, 'red.*bolt') ORDER BY p_partkey
        """,
        "f8_news_admission": _F8_NEWS_SQL,
        "pack_training_shards": """
            WITH s AS (
              SELECT doc_id, CAST(strlen(text) AS BIGINT) AS nbytes
              FROM documents),
            c AS (
              SELECT doc_id, nbytes,
                     CAST(COALESCE(sum(nbytes) OVER (
                       ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS c
              FROM s)
            SELECT doc_id, nbytes, c // 4096 AS shard_id,
                   CAST(row_number() OVER (PARTITION BY c // 4096
                        ORDER BY doc_id) - 1 AS BIGINT) AS sample_idx,
                   c - min(c) OVER (PARTITION BY c // 4096) AS offset_in_shard
            FROM c ORDER BY doc_id
        """,
        "set_ops_union_except": """
            SELECT 'union_nations' AS op, CAST(nationkey AS BIGINT) AS key
            FROM (SELECT DISTINCT nationkey FROM (
                    SELECT c_nationkey AS nationkey FROM customer
                    UNION ALL SELECT s_nationkey FROM supplier))
            UNION ALL
            SELECT 'except_unshipped', CAST(orderkey AS BIGINT)
            FROM (SELECT DISTINCT o_orderkey AS orderkey FROM orders
                  EXCEPT SELECT DISTINCT l_orderkey FROM lineitem)
            ORDER BY op, key
        """,
        "x11_x12_scalar_fns": """
            WITH h AS (
              SELECT c_custkey, md5(c_name) AS name_md5,
                     substr(md5(c_name), 1, 8) || '.' ||
                     substr(md5(c_name), 9, 4) || '.test' AS host
              FROM customer)
            SELECT c_custkey, name_md5, host,
                   array_to_string((string_split(host, '.'))[-2:], '.') AS domain
            FROM h ORDER BY c_custkey
        """,
        "x13_json_extract": """
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
            FROM events ORDER BY event_id LIMIT 2000
        """,
        "t2_stream_composite_filter": """
            SELECT doc_id FROM documents
            WHERE lang IN ('en','es') AND n_chars BETWEEN 100 AND 5000
              AND text LIKE '%the%'
            ORDER BY doc_id
        """,
        "dedup_exact": """
            SELECT md5(text) AS fingerprint, min(doc_id) AS keeper, count(*) AS n_dupes
            FROM documents GROUP BY fingerprint ORDER BY fingerprint
        """,
        "dedup_simhash16": """
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct(list_filter(
                       string_split(lower(text), ' '), x -> x <> ''))) AS tok
              FROM documents),
            e AS (
              SELECT doc_id, substr(md5(tok), 1, 4) AS h4, pos
              FROM toks CROSS JOIN (SELECT unnest(generate_series(0,15)) AS pos)),
            v AS (
              SELECT doc_id, pos,
                     sum(2*(((strpos('0123456789abcdef',
                                     substr(h4, CAST(pos//4 AS INT)+1, 1)) - 1)
                             >> CAST(3 - pos % 4 AS INT)) & 1) - 1) AS s
              FROM e GROUP BY doc_id, pos)
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (1 << CAST(pos AS INT)) ELSE 0 END) AS BIGINT) AS simhash16
            FROM v GROUP BY doc_id ORDER BY doc_id
        """,
        "dedup_embedding_cosine": f"""
            WITH {_PLANTED_EX_SQL},
            norms AS (SELECT vec_id, CAST(sum(val*val) AS BIGINT) AS n2 FROM ex GROUP BY vec_id),
            dots AS (
              SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                     CAST(sum(a.val*b.val) AS BIGINT) AS dot
              FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
              GROUP BY doc_a, doc_b)
            SELECT doc_a, doc_b,
                   CAST(round(dot*1000.0/sqrt(CAST(na.n2*nb.n2 AS DOUBLE))) AS BIGINT) AS cos_milli
            FROM dots JOIN norms na ON na.vec_id = doc_a
                      JOIN norms nb ON nb.vec_id = doc_b
            WHERE CAST(round(dot*1000.0/sqrt(CAST(na.n2*nb.n2 AS DOUBLE))) AS BIGINT) >= 950
            ORDER BY doc_a, doc_b
        """,
        "dedup_minhash_lsh": """
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct(list_filter(
                       string_split(lower(text), ' '), x -> x <> ''))) AS tok
              FROM documents),
            h AS (
              SELECT doc_id, perm, md5(CAST(perm AS VARCHAR) || ':' || tok) AS h
              FROM toks CROSS JOIN (SELECT unnest(generate_series(0,7)) AS perm)),
            sig AS (SELECT doc_id, perm, min(h) AS mh FROM h GROUP BY doc_id, perm),
            band AS (
              SELECT doc_id, CAST(perm//2 AS INT) AS band_id,
                     max(CASE WHEN perm % 2 = 0 THEN mh END) || '|' ||
                     max(CASE WHEN perm % 2 = 1 THEN mh END) AS band_val
              FROM sig GROUP BY doc_id, CAST(perm//2 AS INT))
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM band a JOIN band b
              ON a.band_id = b.band_id AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
            ORDER BY doc_a, doc_b
        """,
        "dedup_ngram_jaccard": _NGRAM_CORE_SQL + " ORDER BY doc_a, doc_b",
        # min-label and star must produce the IDENTICAL component map —
        # the tagged union pins BOTH plans against one CTE in one row
        "dedup_components_ops": _COMPONENTS_OPS_SQL,
        "dedup_semdedup": _SEMDEDUP_SQL,
        "dedup_resolve_canonical": _RESOLVE_SQL,
        "dedup_phash_hamming": """
            WITH h0 AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS ph
              FROM documents),
            h AS (
              SELECT doc_id, ph FROM h0
              UNION ALL
              SELECT orig + 1000000 AS doc_id, xor(ph, mask) AS ph
              FROM (SELECT doc_id AS orig, ph,
                           (CAST(1 AS BIGINT) << CAST(doc_id % 5 AS INT))
                           + CASE WHEN doc_id % 3 >= 1 THEN
                               (CAST(1 AS BIGINT) << CAST(doc_id % 5 + 5 AS INT))
                             ELSE 0 END
                           + CASE WHEN doc_id % 3 >= 2 THEN
                               (CAST(1 AS BIGINT) << CAST(doc_id % 5 + 10 AS INT))
                             ELSE 0 END AS mask
                    FROM h0 WHERE doc_id % 4 = 0)),
            bands AS (
              SELECT doc_id, ph, b.b AS band_id,
                     (ph >> (b.b * 15)) & 32767 AS band_val
              FROM h, (SELECT unnest(generate_series(0, 3)) AS b) b),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band_id = b.band_id AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id)
            SELECT c.doc_a, c.doc_b,
                   CAST(bit_count(xor(ha.ph, hb.ph)) AS BIGINT) AS hamming
            FROM cand c JOIN h ha ON ha.doc_id = c.doc_a
                        JOIN h hb ON hb.doc_id = c.doc_b
            WHERE bit_count(xor(ha.ph, hb.ph)) <= 12
            ORDER BY doc_a, doc_b
        """,
        "dedup_minhash_verified": """
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct(list_filter(
                       string_split(lower(text), ' '), x -> x <> ''))) AS tok
              FROM documents),
            h AS (
              SELECT doc_id, perm, md5(CAST(perm AS VARCHAR) || ':' || tok) AS h
              FROM toks CROSS JOIN (SELECT unnest(generate_series(0,7)) AS perm)),
            sig AS (SELECT doc_id, perm, min(h) AS mh FROM h GROUP BY doc_id, perm),
            band AS (
              SELECT doc_id, CAST(perm//2 AS INT) AS band_id,
                     max(CASE WHEN perm % 2 = 0 THEN mh END) || '|' ||
                     max(CASE WHEN perm % 2 = 1 THEN mh END) AS band_val
              FROM sig GROUP BY doc_id, CAST(perm//2 AS INT)),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM band a JOIN band b
                ON a.band_id = b.band_id AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id),
            sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cand c JOIN toks a ON a.doc_id = c.doc_a
                          JOIN toks b ON b.doc_id = c.doc_b AND b.tok = a.tok
              GROUP BY c.doc_a, c.doc_b)
            SELECT doc_a, doc_b, inter,
                   CAST(round(inter * 1000.0 / (sa.sz + sb.sz - inter)) AS BIGINT) AS jacc_milli
            FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                       JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(round(inter * 1000.0 / (sa.sz + sb.sz - inter)) AS BIGINT) >= 500
            ORDER BY doc_a, doc_b
        """,
        "dedup_embedding_lsh": f"""
            WITH {_PLANTED_EX_SQL},
            tb AS (SELECT t.t, b.b
                   FROM (SELECT unnest(generate_series(0,23)) AS t) t,
                        (SELECT unnest(generate_series(0,15)) AS b) b),
            dims AS (SELECT DISTINCT i FROM ex),
            w AS (
              SELECT t, b, i,
                (strpos('0123456789abcdef', substr(md5(CAST(t AS VARCHAR)||'_'||CAST(b AS VARCHAR)||':'||CAST(i-1 AS VARCHAR)),1,1))-1)*4096
               +(strpos('0123456789abcdef', substr(md5(CAST(t AS VARCHAR)||'_'||CAST(b AS VARCHAR)||':'||CAST(i-1 AS VARCHAR)),2,1))-1)*256
               +(strpos('0123456789abcdef', substr(md5(CAST(t AS VARCHAR)||'_'||CAST(b AS VARCHAR)||':'||CAST(i-1 AS VARCHAR)),3,1))-1)*16
               +(strpos('0123456789abcdef', substr(md5(CAST(t AS VARCHAR)||'_'||CAST(b AS VARCHAR)||':'||CAST(i-1 AS VARCHAR)),4,1))-1)
               - 32768 AS wt
              FROM tb CROSS JOIN dims),
            dots AS (
              SELECT e.vec_id, w.t, w.b, sum(e.val * w.wt) AS wdot
              FROM ex e JOIN w ON w.i = e.i
              GROUP BY e.vec_id, w.t, w.b),
            sigs AS (
              SELECT vec_id, t,
                     CAST(sum(CASE WHEN wdot >= 0 THEN (1 << b) ELSE 0 END) AS BIGINT) AS sig
              FROM dots GROUP BY vec_id, t),
            cand AS (
              SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
              FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig
                                     AND a.vec_id < b.vec_id),
            norms AS (SELECT vec_id, CAST(sum(val*val) AS BIGINT) AS n2 FROM ex GROUP BY vec_id),
            pdots AS (
              SELECT c.doc_a, c.doc_b, CAST(sum(a.val*b.val) AS BIGINT) AS dot
              FROM cand c JOIN ex a ON a.vec_id = c.doc_a
                          JOIN ex b ON b.vec_id = c.doc_b AND b.i = a.i
              GROUP BY c.doc_a, c.doc_b)
            SELECT doc_a, doc_b,
                   CAST(round(dot*1000.0/sqrt(CAST(na.n2*nb.n2 AS DOUBLE))) AS BIGINT) AS cos_milli
            FROM pdots JOIN norms na ON na.vec_id = doc_a
                       JOIN norms nb ON nb.vec_id = doc_b
            WHERE CAST(round(dot*1000.0/sqrt(CAST(na.n2*nb.n2 AS DOUBLE))) AS BIGINT) >= 950
            ORDER BY doc_a, doc_b
        """,
        "ann_topk_ops": """
            WITH q AS (
              SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
              FROM embeddings),
            query AS (SELECT qv AS qq, label AS qlabel FROM q WHERE vec_id = 0),
            dots AS (
              SELECT vec_id, q.label,
                     (SELECT CAST(sum(q.qv[i] * query.qq[i]) AS BIGINT)
                      FROM unnest(generate_series(1, len(q.qv))) AS g(i)) AS dot_milli2
              FROM q, query WHERE vec_id <> 0),
            brute AS (
              SELECT 'brute' AS method, vec_id, label, dot_milli2 FROM dots
              ORDER BY dot_milli2 DESC, vec_id LIMIT 10),
            ivf AS (
              SELECT 'ivf' AS method, vec_id, label, dot_milli2 FROM dots
              WHERE label = (SELECT qlabel FROM query)
              ORDER BY dot_milli2 DESC, vec_id LIMIT 5),
            bq AS (SELECT vec_id AS qid, qv AS qq FROM q
                   WHERE vec_id IN (1, 2, 3)),
            ex AS (SELECT label, i, qv[i] AS val
                   FROM q, unnest(generate_series(1, len(qv))) AS g(i)),
            cell_sums AS (
              SELECT label, i, CAST(sum(val) AS BIGINT) AS s
              FROM ex GROUP BY label, i),
            bq_scores AS (
              SELECT bq.qid, cs.label,
                     CAST(sum(cs.s * bq.qq[cs.i]) AS BIGINT) AS score
              FROM cell_sums cs, bq GROUP BY bq.qid, cs.label),
            bq_probe AS (
              SELECT qid, label FROM (
                SELECT qid, label,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY score DESC, label) AS rn
                FROM bq_scores) WHERE rn <= 2),
            bq_dots AS (
              SELECT bq.qid, q.vec_id, q.label,
                     (SELECT CAST(sum(q.qv[i] * bq.qq[i]) AS BIGINT)
                      FROM unnest(generate_series(1, len(q.qv))) AS g(i))
                       AS dot_milli2
              FROM q
              JOIN bq ON q.vec_id <> bq.qid
              JOIN bq_probe p ON p.qid = bq.qid AND p.label = q.label),
            batch AS (
              SELECT 'batch' || CAST(qid AS VARCHAR) AS method,
                     vec_id, label, dot_milli2
              FROM (SELECT *, row_number() OVER (
                        PARTITION BY qid
                        ORDER BY dot_milli2 DESC, vec_id) AS rn
                    FROM bq_dots) WHERE rn <= 5)
            SELECT * FROM brute UNION ALL SELECT * FROM ivf
            UNION ALL SELECT * FROM batch
            ORDER BY method, dot_milli2 DESC, vec_id
        """,
        "ann_kmeans_cells": _kmeans_cells_sql(k=4, n_iter=2),
        "ann_ivf_nprobe": """
            WITH q AS (
              SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
              FROM embeddings),
            query AS (SELECT qv AS qq, label AS qlabel FROM q WHERE vec_id = 0),
            ex AS (
              SELECT vec_id, label, i, qv[i] AS val
              FROM q, unnest(generate_series(1, len(qv))) AS g(i)),
            cell_sums AS (
              SELECT label, i, CAST(sum(val) AS BIGINT) AS s
              FROM ex WHERE label <> (SELECT qlabel FROM query)
              GROUP BY label, i),
            cell_scores AS (
              SELECT cs.label, CAST(sum(cs.s * query.qq[cs.i]) AS BIGINT) AS score
              FROM cell_sums cs, query GROUP BY cs.label),
            probe AS (
              SELECT qlabel AS label FROM query
              UNION ALL
              SELECT label FROM (
                SELECT label FROM cell_scores
                ORDER BY score DESC, label LIMIT 2)),
            dots AS (
              SELECT vec_id, q.label,
                     (SELECT CAST(sum(q.qv[i] * query.qq[i]) AS BIGINT)
                      FROM unnest(generate_series(1, len(q.qv))) AS g(i)) AS dot_milli2
              FROM q, query
              WHERE q.label IN (SELECT label FROM probe) AND vec_id <> 0)
            SELECT vec_id, label, dot_milli2 FROM dots
            ORDER BY dot_milli2 DESC, vec_id LIMIT 8
        """,
        "sample_ops": """
            SELECT 'det' AS op, doc_id, lang,
                   CAST(n_chars AS BIGINT) AS v1, CAST(-1 AS BIGINT) AS v2
            FROM documents
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                  * 1000 < 100 * 4294967296
            UNION ALL
            SELECT 'quota', doc_id, lang, CAST(n_chars AS BIGINT),
                   CAST(lang_rank AS BIGINT)
            FROM (SELECT doc_id, lang, n_chars,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY n_chars DESC, doc_id)
                           AS lang_rank
                  FROM documents)
            WHERE lang_rank <= 25
            UNION ALL
            SELECT 'mix', doc_id, lang, CAST(n_chars AS BIGINT),
                   CAST(-1 AS BIGINT)
            FROM documents
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                  * 1000
                  < (CASE lang WHEN 'en' THEN 400 WHEN 'de' THEN 800
                               WHEN 'es' THEN 200 WHEN 'zh' THEN 100
                               ELSE 0 END) * 4294967296
            UNION ALL
            SELECT 'split_' || (CASE
                     WHEN b * 1000 < 50 * 4294967296 THEN 'val'
                     WHEN b * 1000 < 100 * 4294967296 THEN 'test'
                     ELSE 'train' END),
                   doc_id, lang, CAST(n_chars AS BIGINT),
                   CAST(-1 AS BIGINT)
            FROM (SELECT doc_id, lang, n_chars,
                         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS b
                  FROM documents)
            UNION ALL
            SELECT 'up', doc_id, lang, CAST(e AS BIGINT),
                   CAST(n_chars AS BIGINT)
            FROM (SELECT doc_id, lang, n_chars,
                         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS b,
                         (CASE lang WHEN 'en' THEN 2100
                                    WHEN 'zh' THEN 1400
                                    ELSE 0 END) AS r
                  FROM documents) t,
                 unnest(generate_series(0, r // 1000)) AS g(e)
            WHERE e < r // 1000
               OR b * 1000 < (r % 1000) * 4294967296
            UNION ALL
            SELECT 'shuf', doc_id, lang,
                   CAST(row_number() OVER (
                     ORDER BY md5('3:' || CAST(doc_id AS VARCHAR)),
                              doc_id) - 1 AS BIGINT),
                   CAST(n_chars AS BIGINT)
            FROM documents
            ORDER BY op, doc_id, v1
        """,
        "export_webdataset_manifest": """
            WITH s AS (
              SELECT doc_id,
                     octet_length(encode(text)) AS nb,
                     512 + (octet_length(encode(text)) + 511) // 512 * 512
                       AS mb
              FROM documents WHERE text IS NOT NULL
            ), o AS (
              SELECT doc_id, nb, mb,
                     COALESCE(CAST(SUM(mb) OVER (
                       ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS BIGINT), 0) AS st
              FROM s)
            SELECT CAST(st // 65536 AS BIGINT) AS shard_id,
                   printf('shard-%06d.tar', CAST(st // 65536 AS INT))
                     AS path,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(nb) AS BIGINT) AS payload_bytes,
                   CAST((CAST(SUM(mb) AS BIGINT) + 1024 + 10239)
                        // 10240 * 10240 AS BIGINT) AS tar_bytes
            FROM o GROUP BY 1, 2 ORDER BY shard_id
        """,
        "text_token_ops": """
            SELECT 'ws' AS op, doc_id,
                   CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS v1,
                   CAST(n_chars AS BIGINT) AS v2,
                   CAST(-1 AS BIGINT) AS v3
            FROM documents
            UNION ALL
            SELECT 'pretok', doc_id,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT),
                   CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
                                   t -> regexp_matches(t, '^[A-Za-z]+$'))) AS BIGINT),
                   CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
                                   t -> regexp_matches(t, '^[0-9]+$'))) AS BIGINT)
            FROM documents
            ORDER BY op, doc_id
        """,
        "text_bpe_encode": _BPE_ENCODE_SQL,
        "text_quality_ops": """
            WITH q AS (
              SELECT 'quality' AS op, doc_id,
                     CAST(n_chars AS BIGINT) AS v1,
                     CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS v2,
                     CAST((length(text) - length(replace(text, ' the ', '')))/5 AS BIGINT) AS v3,
                     CAST(round(n_chars * 1000.0 /
                          len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS v4,
                     CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20
                      AND CAST((length(text) - length(replace(text, ' the ', '')))/5 AS BIGINT) > 0 AS BIGINT) AS v5,
                     '-' AS s1
              FROM documents),
            s AS (
              SELECT doc_id,
                CAST((length(text)-length(replace(text,' the ','')))/5 AS BIGINT) AS s_en,
                CAST((length(text)-length(replace(text,' la ','')))/4 AS BIGINT) AS s_es,
                CAST((length(text)-length(replace(text,' le ','')))/4 AS BIGINT) AS s_fr,
                CAST((length(text)-length(replace(text,' der ','')))/5 AS BIGINT) AS s_de
              FROM documents),
            l AS (
              SELECT 'lang' AS op, doc_id,
                     CAST(-1 AS BIGINT) AS v1, CAST(-1 AS BIGINT) AS v2,
                     CAST(-1 AS BIGINT) AS v3, CAST(-1 AS BIGINT) AS v4,
                     CAST(-1 AS BIGINT) AS v5,
                     CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                          WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                          WHEN s_fr >= s_de THEN 'fr'
                          ELSE 'de' END AS s1
              FROM s)
            SELECT * FROM q UNION ALL SELECT * FROM l
            ORDER BY op, doc_id
        """,
        "text_lm_score": f"""
            WITH train AS (
              SELECT text FROM documents WHERE text IS NOT NULL
              UNION ALL SELECT '{_LM_TRAIN_PLANT}'
            ),
            score_docs AS (
              SELECT doc_id, text FROM documents WHERE text IS NOT NULL
              UNION ALL
              SELECT * FROM (VALUES
                {", ".join("(%d, '%s')" % p for p in _LM_SCORE_PLANTS)}
              ) v(doc_id, text)
            ),
            tw AS (
              SELECT list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                    t -> lower(t)) AS ws
              FROM train),
            tt AS (
              SELECT i AS pos, ws[i] AS tok,
                     CASE WHEN i >= 2 THEN ws[i-1] END AS p1,
                     CASE WHEN i >= 3 THEN ws[i-2] END AS p2
              FROM tw, unnest(generate_series(1, len(ws))) u(i)),
            c1 AS (SELECT tok AS g, CAST(count(*) AS BIGINT) AS n
                   FROM tt GROUP BY 1),
            c2 AS (SELECT p1 || ' ' || tok AS g, CAST(count(*) AS BIGINT) AS n
                   FROM tt WHERE pos >= 2 GROUP BY 1),
            c3 AS (SELECT p2 || ' ' || p1 || ' ' || tok AS g,
                          CAST(count(*) AS BIGINT) AS n
                   FROM tt WHERE pos >= 3 GROUP BY 1),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tt),
            sw AS (
              SELECT doc_id,
                     list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                    t -> lower(t)) AS ws
              FROM score_docs),
            st AS (
              SELECT doc_id, i AS pos, ws[i] AS tok,
                     CASE WHEN i >= 2 THEN ws[i-1] END AS p1,
                     CASE WHEN i >= 3 THEN ws[i-2] END AS p2
              FROM sw, unnest(generate_series(1, len(ws))) u(i)),
            j AS (
              SELECT st.doc_id, st.pos, t3.n AS n3, d3.n AS dn3,
                     t2.n AS n2, d2.n AS dn2, u1.n AS n1, nn.n AS nt
              FROM st
              LEFT JOIN c3 t3 ON (st.p2 || ' ' || st.p1 || ' ' || st.tok) = t3.g
              LEFT JOIN c2 d3 ON (st.p2 || ' ' || st.p1) = d3.g
              LEFT JOIN c2 t2 ON (st.p1 || ' ' || st.tok) = t2.g
              LEFT JOIN c1 d2 ON st.p1 = d2.g
              LEFT JOIN c1 u1 ON st.tok = u1.g
              CROSS JOIN nn),
            tq AS (
              SELECT doc_id,
                CASE WHEN pos >= 3 AND n3 IS NOT NULL THEN 3
                     WHEN pos >= 2 AND n2 IS NOT NULL THEN 2
                     WHEN n1 IS NOT NULL THEN 1 ELSE 0 END AS lvl,
                CASE WHEN pos >= 3 AND n3 IS NOT NULL
                       THEN (n3 * 1000000) // dn3
                     WHEN pos >= 2 AND n2 IS NOT NULL
                       THEN (n2 * 1000000
                             * (CASE WHEN pos >= 3 THEN 2 ELSE 1 END))
                            // (dn2 * (CASE WHEN pos >= 3 THEN 5 ELSE 1 END))
                     WHEN n1 IS NOT NULL
                       THEN (n1 * 1000000
                             * (CASE WHEN pos >= 3 THEN 4
                                     WHEN pos = 2 THEN 2 ELSE 1 END))
                            // (nt * (CASE WHEN pos >= 3 THEN 25
                                           WHEN pos = 2 THEN 5 ELSE 1 END))
                     ELSE 0 END AS q
              FROM j),
            agg AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hits3,
                     CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS hits2,
                     CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits1,
                     CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oov,
                     CAST(sum(q) AS BIGINT) AS score_q
              FROM tq GROUP BY doc_id)
            SELECT sw.doc_id, CAST(len(sw.ws) AS BIGINT) AS n_tokens,
                   coalesce(a.hits3, 0) AS hits3,
                   coalesce(a.hits2, 0) AS hits2,
                   coalesce(a.hits1, 0) AS hits1,
                   coalesce(a.oov, 0) AS oov,
                   coalesce(a.score_q, 0) AS score_q
            FROM sw LEFT JOIN agg a ON a.doc_id = sw.doc_id
            ORDER BY sw.doc_id
        """,
        "doc_fingerprint": """
            WITH d AS (
              SELECT doc_id, text, n_chars FROM documents
              UNION ALL
              SELECT 1000000, 'tiny planted doc', 16)
            SELECT doc_id,
                   md5(CAST(n_chars AS VARCHAR) || ':' || substr(text, 1, 64)
                       || ':' || substr(text, greatest(n_chars - 63, 1), 64))
                     AS fingerprint
            FROM d ORDER BY doc_id
        """,
        "text_repetition_filters": f"""
            WITH d AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT * FROM (VALUES {_values_sql(_REP_DOCS)}) v(doc_id, text)),
            arr AS (
              SELECT doc_id,
                     list_filter(string_split(text, chr(10)), x -> x <> '') AS ls,
                     list_filter(string_split_regex(text, '[ \\n]'), x -> x <> '') AS ws
              FROM d),
            stats AS (
              SELECT doc_id,
                     len(ls) AS n_lines,
                     len(ls) - len(list_distinct(ls)) AS n_dup_lines,
                     len(ws) AS n_words,
                     len(ws) - len(list_distinct(ws)) AS n_dup_words,
                     coalesce(list_max(list_transform(list_distinct(ws),
                         w -> len(list_filter(ws, x -> x = w)))), 0)
                       AS top_word_count
              FROM arr)
            SELECT doc_id, n_lines, n_dup_lines, n_words, n_dup_words,
                   top_word_count,
                   n_dup_lines * 10 > n_lines * 3 AS flag_dup_lines,
                   top_word_count >= 2 AND top_word_count * 5 > n_words
                     AS flag_top_word,
                   n_dup_words * 10 > n_words * 7 AS flag_dup_words,
                   NOT (n_dup_lines * 10 > n_lines * 3
                        OR (top_word_count >= 2
                            AND top_word_count * 5 > n_words)
                        OR n_dup_words * 10 > n_words * 7) AS keep
            FROM stats ORDER BY doc_id
        """,
        "text_pii_scrub": f"""
            WITH d AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT * FROM (VALUES {_values_sql(_PII_DOCS)}) v(doc_id, text)),
            s AS (
              SELECT doc_id, text,
                     regexp_replace(text, '{_txt.EMAIL_PATTERN}',
                                    '<EMAIL>', 'g') AS t1
              FROM d)
            SELECT doc_id,
                   len(regexp_extract_all(text, '{_txt.EMAIL_PATTERN}')) AS n_emails,
                   len(regexp_extract_all(t1, '{_txt.PHONE_PATTERN}')) AS n_phones,
                   len(regexp_extract_all(text, '{_txt.EMAIL_PATTERN}'))
                     + len(regexp_extract_all(t1, '{_txt.PHONE_PATTERN}')) > 0
                     AS has_pii,
                   length(regexp_replace(t1, '{_txt.PHONE_PATTERN}',
                                         '<PHONE>', 'g')) AS n_chars_scrubbed,
                   md5(regexp_replace(t1, '{_txt.PHONE_PATTERN}',
                                      '<PHONE>', 'g')) AS scrubbed_md5
            FROM s ORDER BY doc_id
        """,
        "dedup_duplicate_spans": f"""
            WITH d AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT * FROM (VALUES {_values_sql(_SPAN_DOCS)}) v(doc_id, text)),
            w AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
              FROM d),
            g AS (
              SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+3], ' ')) AS h
              FROM w, unnest(generate_series(1, len(ws)-3)) AS t(i)),
            seeds AS (
              SELECT doc_id, pos,
                     count(*) OVER (PARTITION BY h) AS cnt
              FROM g QUALIFY cnt > 1),
            isl AS (
              SELECT doc_id, pos,
                     CASE WHEN pos > lag(pos, 1, -1073741824)
                            OVER (PARTITION BY doc_id ORDER BY pos) + 3
                          THEN 1 ELSE 0 END AS brk
              FROM seeds),
            isl2 AS (
              SELECT doc_id, pos,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS grp
              FROM isl)
            SELECT doc_id, min(pos) AS span_start, max(pos) + 3 AS span_end
            FROM isl2 GROUP BY doc_id, grp
            ORDER BY doc_id, span_start
        """,
        "decontaminate_ngram": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
              FROM documents),
            g AS (
              SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
              FROM w, unnest(generate_series(1, len(ws)-4)) AS t(i)),
            bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0),
            hits AS (
              SELECT g.doc_id, count(*) AS n_hits
              FROM g JOIN bg USING (gram) GROUP BY g.doc_id),
            one AS (
              SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
                     coalesce(h.n_hits, 0) > 0 AS contaminated
              FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id)
            SELECT m.method, o.doc_id, o.n_hits, o.contaminated
            FROM one o, (VALUES ('bcast'), ('bloom')) AS m(method)
            ORDER BY m.method, o.doc_id
        """,
    }
