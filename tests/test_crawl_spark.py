"""Spark engine ≡ Python oracle: crawl order, bloom bitmap, lineage
(the BASELINE.json north_rule correctness contract), plus resume."""

import numpy as np
import pytest

from delver_spark.oracle.crawler import run_oracle


@pytest.fixture(scope="module")
def oracle_result(unit_corpus):
    return run_oracle(unit_corpus)


@pytest.fixture(scope="module")
def engine_result(spark, unit_corpus, tmp_path_factory):
    from delver_spark.operators.crawl import CrawlEngine

    wd = str(tmp_path_factory.mktemp("crawl_wd"))
    eng = CrawlEngine(spark, unit_corpus, wd)
    eng.run()
    return eng


def _order_tuples_oracle(res):
    return [(r["seq"], r["url_canon"], r["depth"], r["round"], r["host"],
             r["success"]) for r in res.crawl_order]


def _order_tuples_engine(eng):
    df = eng.crawl_order_df()
    return list(df[["seq", "url_canon", "depth", "round", "host", "success"]]
                .itertuples(index=False, name=None))


def test_crawl_order_exact_match(oracle_result, engine_result):
    assert _order_tuples_engine(engine_result) == _order_tuples_oracle(oracle_result)


def test_seen_set_bit_for_bit(oracle_result, engine_result):
    assert np.array_equal(oracle_result.bloom.bit_positions(),
                          engine_result.bloom.bit_positions())
    assert oracle_result.bloom.n == engine_result.bloom.n


def test_lineage_counters_match(oracle_result, engine_result):
    ol = [(r["round"], r["partition"], r["fetched"], r["deduped"],
           r["enqueued"], r["stashed"]) for r in oracle_result.lineage]
    df = engine_result.lineage_df()
    sl = list(df[["round", "partition", "fetched", "deduped", "enqueued",
                  "stashed"]].itertuples(index=False, name=None))
    assert ol == sl


def test_payload_invariant_all_rows(engine_result):
    """BASELINE.json input_hint per-row invariant: decoded-pixel allclose
    (ppm), PSNR >= 40 dB (qjpg, vs golden pixels), phash equality."""
    import pandas as pd
    import pyarrow.parquet as pq

    parts = engine_result.store.part_dirs("documents", engine_result.round)
    docs = pd.concat([pq.read_table(p).to_pandas() for p in parts])
    assert len(docs) > 0
    assert docs["payload_ok"].all()
    assert docs["phash_ok"].all()
    qjpg_psnr = docs["psnr"].dropna()
    assert len(qjpg_psnr) > 0 and (qjpg_psnr >= 40.0).all()


def test_big_g_path_matches_oracle(spark, tmp_path_factory):
    """G > 10000 selects the big-batch plan (fused Arrow admission,
    broadcast-keys fetch, pid-sharded rank) — must stay bit-exact."""
    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.operators.crawl import CrawlEngine

    d = str(tmp_path_factory.mktemp("corpus_bigg"))
    generate_corpus(d, n_pages=150, n_hosts=8, seed=11, max_rounds=5,
                    global_budget=20000, per_host_budget=50)
    oracle = run_oracle(d)
    wd = str(tmp_path_factory.mktemp("crawl_bigg"))
    eng = CrawlEngine(spark, d, wd)
    eng.run()
    assert _order_tuples_engine(eng) == _order_tuples_oracle(oracle)
    assert np.array_equal(oracle.bloom.bit_positions(),
                          eng.bloom.bit_positions())


def test_big_g_admission_url_groups_span_arrow_batches(spark, tmp_path_factory):
    """Regression: the fused admission pass must see each shuffle
    partition as ONE frame. With the default 10k-row Arrow batch a
    partition arrives in one piece at test scale, hiding a bug where
    per-batch min-page selection admits the same url from two different
    pages (a double-fetch at real scale). Force 16-row batches so url
    groups straddle batch boundaries."""
    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.operators.crawl import CrawlEngine

    d = str(tmp_path_factory.mktemp("corpus_bigg_small_arrow"))
    generate_corpus(d, n_pages=150, n_hosts=8, seed=11, max_rounds=5,
                    global_budget=20000, per_host_budget=50)
    oracle = run_oracle(d)
    wd = str(tmp_path_factory.mktemp("crawl_bigg_small_arrow"))
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "16")
    try:
        eng = CrawlEngine(spark, d, wd)
        eng.run()
    finally:
        spark.conf.set(key, old)
    assert _order_tuples_engine(eng) == _order_tuples_oracle(oracle)
    assert np.array_equal(oracle.bloom.bit_positions(),
                          eng.bloom.bit_positions())


def test_mor_compaction_every_round_stays_exact(spark, tmp_path_factory):
    """The frontier's merge-on-read state (tombstones + deltas) compacts
    into a new base when tombstones exceed the floor. Force compaction
    EVERY round (floor=1) on a big-G corpus whose per-host budget
    actually binds — results must stay bit-identical to the oracle."""
    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.operators.crawl import CrawlEngine

    d = str(tmp_path_factory.mktemp("corpus_compact"))
    generate_corpus(d, n_pages=150, n_hosts=8, seed=29, max_rounds=6,
                    global_budget=20000, per_host_budget=3)
    oracle = run_oracle(d)
    wd = str(tmp_path_factory.mktemp("crawl_compact"))
    eng = CrawlEngine(spark, d, wd)
    eng._compact_floor = 1
    eng.run()
    assert _order_tuples_engine(eng) == _order_tuples_oracle(oracle)
    assert np.array_equal(oracle.bloom.bit_positions(),
                          eng.bloom.bit_positions())


def test_resume_equals_uninterrupted(spark, unit_corpus, tmp_path_factory,
                                     oracle_result):
    """Kill after round k, resume from snapshot → identical final state
    (SURVEY §5.2-3; BASELINE.json 'resume exactly from checkpoints')."""
    from delver_spark.operators.crawl import CrawlEngine

    wd = str(tmp_path_factory.mktemp("crawl_resume"))
    eng1 = CrawlEngine(spark, unit_corpus, wd)
    eng1.run(max_rounds=3)  # commits snapshot at round 3, then "dies"

    eng2 = CrawlEngine.resume(spark, unit_corpus, wd)
    assert eng2.round == 3
    eng2.run()

    want = _order_tuples_oracle(oracle_result)
    got = _order_tuples_engine(eng2)
    assert got == want
    assert np.array_equal(oracle_result.bloom.bit_positions(),
                          eng2.bloom.bit_positions())


def test_host_budget_overrides_match_oracle(spark, tmp_path_factory):
    """Crawl-delay politeness in the round loop: per-host dequeue-budget
    overrides (incl. a 0 = fully blocked host) are SEMANTIC, so both
    engine and oracle take the same map and the full order/bloom/lineage
    equality must hold — and the blocked host must never be fetched."""
    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.operators.crawl import CrawlEngine

    d = str(tmp_path_factory.mktemp("corpus_hb"))
    generate_corpus(d, n_pages=200, n_hosts=8, seed=17, max_rounds=6)
    budgets = {"d001.test": 1, "d002.test": 0, "www.d000.test": 2}
    oracle = run_oracle(d, host_budgets=budgets)
    base = run_oracle(d)
    # non-vacuity: the overrides must actually change the crawl
    assert _order_tuples_oracle(oracle) != _order_tuples_oracle(base)
    assert not any(r["host"] == "d002.test" for r in oracle.crawl_order)

    wd = str(tmp_path_factory.mktemp("crawl_hb"))
    eng = CrawlEngine(spark, d, wd, host_budgets=budgets)
    eng.run()
    assert _order_tuples_engine(eng) == _order_tuples_oracle(oracle)
    assert np.array_equal(oracle.bloom.bit_positions(),
                          eng.bloom.bit_positions())
    ol = [(r["round"], r["partition"], r["fetched"], r["deduped"],
           r["enqueued"], r["stashed"]) for r in oracle.lineage]
    df = eng.lineage_df()
    assert ol == list(df[["round", "partition", "fetched", "deduped",
                          "enqueued", "stashed"]]
                      .itertuples(index=False, name=None))


def test_host_budgets_survive_resume(spark, tmp_path_factory):
    """host_budgets is SEMANTIC, so resume must restore it from the
    manifest — a resumed crawl with forgotten budgets would silently
    revert to the uniform B and diverge from the oracle."""
    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.operators.crawl import CrawlEngine

    d = str(tmp_path_factory.mktemp("corpus_hbr"))
    generate_corpus(d, n_pages=200, n_hosts=8, seed=17, max_rounds=6)
    budgets = {"d001.test": 1, "d002.test": 0}
    oracle = run_oracle(d, host_budgets=budgets)

    wd = str(tmp_path_factory.mktemp("crawl_hbr"))
    eng1 = CrawlEngine(spark, d, wd, host_budgets=budgets)
    eng1.run(max_rounds=3)  # commits, then "dies"
    eng2 = CrawlEngine.resume(spark, d, wd)
    assert eng2.host_budgets == budgets
    eng2.run()
    assert _order_tuples_engine(eng2) == _order_tuples_oracle(oracle)
