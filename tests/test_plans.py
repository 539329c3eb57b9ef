"""Physical-plan assertions: predicate pushdown, column pruning, and
broadcast joins must actually reach the scan (SURVEY §4.1; the 100 TB
design depends on these, so they are pinned as tests)."""

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


import contextlib
import io


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .filter(F.col("l_shipdate") <= "1998-09-02") \
        .select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("\n")[0]


def test_column_pruning(spark):
    # single-op function (consolidated into o3_f10_search_ops in the gate
    # dict late r4; the pruning pin wants the bare projection plan)
    df = entrymod.f10_field_projection(spark, SF)
    plan = _plan(df)
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema  # unused column not read


def test_broadcast_join_for_tiny_dim(spark):
    df = entrymod.queries()["j2_robots_lookup"](spark, SF)
    assert "BroadcastHashJoin" in _plan(df)


def test_anti_join_strategy(spark):
    df = entrymod.queries()["j3_seen_anti_join"](spark, SF)
    plan = _plan(df)
    assert "LeftAnti" in plan


def test_in_filter_pushdown_for_fetch(spark, tmp_path):
    """The small-round fetch path pushes the batch's IN-list into the
    payload scan (operators/crawl.py)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "pages.parquet"
    d.mkdir()
    pq.write_table(pa.table({"url_canon": [f"u{i}" for i in range(100)],
                             "payload": [b"x"] * 100}),
                   str(d / "part-0.parquet"))
    pages = spark.read.parquet(str(d))
    pruned = pages.filter(F.col("url_canon").isin(["u1", "u2", "u3"]))
    plan = _plan(pruned)
    assert "PushedFilters" in plan and "url_canon" in plan.split("PushedFilters")[1].split("\n")[0]


def test_whole_stage_codegen_on_textstats(spark):
    """Text analysis ops stay JVM-side (no Python in the plan). Pins the
    bare module-level function — the gate key was consolidated into
    text_quality_ops in r5-s9 (the r4 test_column_pruning precedent)."""
    df = entrymod.text_quality_score(spark, SF)
    plan = _plan(df)
    # no BatchEvalPython / ArrowEvalPython: everything stays JVM-side where
    # whole-stage codegen applies (AQE formatted plans list the operators)
    assert "Python" not in plan
    assert "Scan parquet" in plan and "Project" in plan


def test_ivf_cell_filter_pushes_to_scan(spark):
    """cosine_topk_ivf must prune the scan on the cell column: the query
    cell is resolved driver-side and applied as a literal filter, so the
    parquet scan shows a pushed filter on `label` (VERDICT r1 #6 — the
    old plan filtered after a crossJoin and scanned the full table)."""
    from delver_spark.operators.similarity import cosine_topk_ivf

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = cosine_topk_ivf(emb, 0, 5)
    plan = _plan(df)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1].split("\n")[0]
    assert "label" in pushed
    # and no cartesian/broadcast-nested-loop join remains in the plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deterministic_sample_partition_invariant(spark):
    """The hash-rate sample keeps the SAME rows under any partitioning
    (the property rand(seed) lacks — Spark seeds rand per partition),
    and stays JVM-side."""
    from delver_spark.operators.textstats import deterministic_sample

    d = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "lang", "n_chars")
    a = deterministic_sample(d, 100).collect()
    b = deterministic_sample(d.repartition(17, "lang"), 100).collect()
    assert len(a) > 0
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # ~10% +- concentration at n=500
    assert 20 <= len(a) <= 90
    assert "Python" not in _plan(deterministic_sample(d, 100))


def test_mixture_sample_semantics(spark):
    """mixture_sample == per-group deterministic_sample union; unmapped
    groups take the default; a group's kept set is MONOTONE in its rate
    (remixing shares rows); plan stays JVM-side."""
    import pytest

    from delver_spark.operators.textstats import (deterministic_sample,
                                                  mixture_sample)

    d = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "lang", "n_chars")
    rates = {"en": 400, "de": 800, "es": 200}
    got = sorted(r.doc_id for r in mixture_sample(d, rates).collect())
    want = []
    for g, r in rates.items():
        want += [x.doc_id for x in
                 deterministic_sample(d.filter(F.col("lang") == g),
                                      r).collect()]
    assert got == sorted(want)  # fr/zh unmapped -> default 0 -> dropped
    # default_milli routes unmapped groups
    full = sorted(r.doc_id for r in
                  mixture_sample(d, rates, default_milli=1000).collect())
    n_unmapped = d.filter(~F.col("lang").isin(*rates)).count()
    assert len(full) == len(got) + n_unmapped
    # monotone: en@200 subset of en@400
    lo = {r.doc_id for r in
          mixture_sample(d, {"en": 200}).collect()}
    hi = {r.doc_id for r in
          mixture_sample(d, {"en": 400}).collect()}
    assert lo <= hi and len(lo) < len(hi)
    assert "Python" not in _plan(mixture_sample(d, rates))
    with pytest.raises(ValueError):
        mixture_sample(d, {"en": 1001})


def test_mixture_upsample_semantics(spark):
    """Rates > 1.0: full epochs + a deterministic fractional epoch.
    For rates <= 1000 it degenerates to mixture_sample + epoch 0; the
    fractional epoch's kept set IS mixture_sample at (rate mod 1000);
    the (id, epoch) set is monotone in the rate and partition-
    invariant; plan stays JVM-side."""
    import pytest

    from delver_spark.operators.textstats import (mixture_sample,
                                                  mixture_upsample)

    d = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "lang", "n_chars")

    # degenerate case: <=1000 rates match mixture_sample exactly
    rates_lo = {"en": 400, "de": 800}
    up = mixture_upsample(d, rates_lo).collect()
    assert all(r.epoch == 0 for r in up)
    assert (sorted(r.doc_id for r in up)
            == sorted(r.doc_id
                      for r in mixture_sample(d, rates_lo).collect()))

    # en@2500: every en doc appears at epochs 0 and 1; the epoch-2 set
    # equals mixture_sample at the fractional rate 500
    rows = mixture_upsample(d, {"en": 2500}).collect()
    en_ids = {r.doc_id for r in d.filter("lang = 'en'").collect()}
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, set()).add(r.doc_id)
    assert by_epoch[0] == en_ids and by_epoch[1] == en_ids
    frac = {r.doc_id
            for r in mixture_sample(d, {"en": 500}).collect()}
    assert by_epoch[2] == frac and 0 < len(frac) < len(en_ids)

    # monotone in the rate: 1500 -> 2200 keeps every (id, epoch)
    lo = {(r.doc_id, r.epoch)
          for r in mixture_upsample(d, {"en": 1500}).collect()}
    hi = {(r.doc_id, r.epoch)
          for r in mixture_upsample(d, {"en": 2200}).collect()}
    assert lo <= hi and len(lo) < len(hi)

    # partition invariance + JVM-side plan
    again = {(r.doc_id, r.epoch)
             for r in mixture_upsample(d.repartition(13), {"en": 2200})
             .collect()}
    assert again == hi
    assert "Python" not in _plan(mixture_upsample(d, {"en": 2500}))
    with pytest.raises(ValueError):
        mixture_upsample(d, {"en": -1})


def test_deterministic_split_semantics(spark):
    """Total partition, deterministic, first split monotone in its own
    size, consistent with deterministic_sample's kept set (a 100-milli
    FIRST split == the rate-100 sample)."""
    import pytest

    from delver_spark.operators.textstats import (deterministic_sample,
                                                  deterministic_split)

    d = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "lang", "n_chars")
    n = d.count()
    out = deterministic_split(d, {"val": 100, "train": 900})
    by = {r["split"]: r["n"] for r in
          out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == n and set(by) == {"val", "train"}
    # first split == the same-rate deterministic sample
    val_ids = {r.doc_id for r in out.filter("split = 'val'").collect()}
    samp_ids = {r.doc_id for r in deterministic_sample(d, 100).collect()}
    assert val_ids == samp_ids
    # monotone: growing the first split keeps its rows in it
    val2 = {r.doc_id for r in
            deterministic_split(d, {"val": 200, "train": 800})
            .filter("split = 'val'").collect()}
    assert val_ids <= val2
    with pytest.raises(ValueError):
        deterministic_split(d, {"a": 500, "b": 400})


def test_ivf_partitioned_table_prunes_partitions(spark, tmp_path):
    """The 100 TB claim made concrete: over a table PARTITIONED by the
    cell column, the literal cell filter becomes directory-level
    partition pruning — only the probed cells' files are read at all."""
    from delver_spark.operators.similarity import cosine_topk_ivf

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "emb_by_cell")
    emb.write.partitionBy("label").parquet(path)
    part = spark.read.parquet(path)
    df = cosine_topk_ivf(part, 0, 5)
    plan = _plan(df)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "label" in pf
    # same top-k as the unpartitioned path
    base = cosine_topk_ivf(emb, 0, 5)
    assert sorted(tuple(r) for r in df.collect()) == \
        sorted(tuple(r) for r in base.collect())


def test_ivf_nprobe_index_df_equal(spark):
    """The DataFrame-backed index (for cell counts too large for a
    driver map) must rank cells identically to the in-memory index, and
    its per-probe work is an aggregation over the stats table only."""
    from delver_spark.operators.similarity import (build_ivf_index,
                                                   build_ivf_index_df,
                                                   cosine_topk_ivf)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = build_ivf_index(emb)
    stats = build_ivf_index_df(emb).localCheckpoint(eager=True)
    a = cosine_topk_ivf(emb, 0, 8, n_probe=3, index=idx).collect()
    b = cosine_topk_ivf(emb, 0, 8, n_probe=3, index_df=stats).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_ivf_index_incremental_merge(spark):
    """The "maintained incrementally at ingest" claim, pinned: building
    the index on two disjoint halves of the table and merging the
    per-cell sums (merge_ivf_index) equals the full rebuild EXACTLY —
    sums are decomposable integers, no rounding anywhere."""
    from delver_spark.operators.similarity import (build_ivf_index,
                                                   merge_ivf_index)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    full = build_ivf_index(emb)
    a = build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0))
    b = build_ivf_index(emb.filter(F.col("vec_id") % 2 == 1))
    assert merge_ivf_index(a, b) == full
    # merge is symmetric and identity-on-empty
    assert merge_ivf_index(b, a) == full
    assert merge_ivf_index(full, {}) == full


def test_language_quota_salted_equals_plain(spark):
    """The salted two-phase pre-cut must return EXACTLY the plain
    window's rows on a skewed corpus (80% one language) — the
    per-(lang, salt) top-N is a superset of the per-lang top-N, and
    phase 2 re-ranks exactly (VERDICT r3 "what's wrong" #3)."""
    from delver_spark.operators.textstats import language_quota

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 5 < 4, "en")
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 7).cast("string")))
        .alias("lang"),
        # ties on quality exercise the id tie-break through the pre-cut
        (F.col("id") % 97).alias("n_chars"))
    plain = language_quota(df, 25).collect()
    for s in (2, 4, 16):
        salted = language_quota(df, 25, salt_buckets=s).collect()
        assert [tuple(r) for r in salted] == [tuple(r) for r in plain], s
    assert len(plain) > 0


def test_ivf_nprobe_no_table_scan(spark):
    """Multi-probe cell ranking must come from the precomputed index,
    not a per-query full-table aggregation (VERDICT r2 "what's wrong"
    #1): with an index supplied, building the probe plan runs at most
    ONE Spark job (the 1-row query-vector lookup), and the returned
    plan contains no exploded aggregation."""
    from delver_spark.operators.similarity import (build_ivf_index,
                                                   cosine_topk_ivf)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = build_ivf_index(emb)
    sc = spark.sparkContext
    sc.setJobGroup("ivf_probe", "nprobe ranking must not scan the table")
    try:
        df = cosine_topk_ivf(emb, 0, 8, n_probe=3, index=idx)
        jobs = sc.statusTracker().getJobIdsForGroup("ivf_probe")
    finally:
        sc.setJobGroup(None, None)
    assert len(jobs) <= 1, f"probe launched {len(jobs)} jobs: {jobs}"
    plan = _plan(df)
    assert "Generate" not in plan  # no posexplode of the table per probe
    pushed = plan.split("PushedFilters")[1].split("\n")[0]
    assert "label" in pushed
    # identical output to the self-built-index path (engine-exact ranking)
    legacy = cosine_topk_ivf(emb, 0, 8, n_probe=3)
    assert [tuple(r) for r in df.collect()] == \
        [tuple(r) for r in legacy.collect()]
