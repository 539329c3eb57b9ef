"""DLQ / poison-row quarantine (VERDICT r1 #7, queue/file.go:167-204):
one corrupted payload must not kill the round — the row is quarantined
(url + error + round recorded) and the rest of the crawl matches the
oracle exactly, with no markVisited for the poisoned page."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from delver_spark.oracle.crawler import run_oracle


@pytest.fixture(scope="module")
def poison_corpus(tmp_path_factory):
    from delver_spark.fixtures.gen import generate_corpus

    d = str(tmp_path_factory.mktemp("corpus_poison"))
    generate_corpus(d, n_pages=150, n_hosts=8, seed=11, max_rounds=5)
    clean = run_oracle(d)
    # poison a page that is actually fetched successfully after round 0
    victim = next(r["url_canon"] for r in clean.crawl_order
                  if r["round"] >= 1 and r["success"])
    pages_path = os.path.join(d, "pages.parquet")
    tbl = pq.read_table(pages_path)
    urls = tbl.column("url_canon").to_pylist()
    blobs = tbl.column("bytes").to_pylist()
    idx = urls.index(victim)
    blobs[idx] = b"\x00\x01garbage"  # undecodable payload
    cols = {name: tbl.column(name) for name in tbl.column_names}
    cols["bytes"] = pa.array(blobs, type=pa.binary())
    import shutil
    shutil.rmtree(pages_path) if os.path.isdir(pages_path) \
        else os.remove(pages_path)
    pq.write_table(pa.table(cols), pages_path, row_group_size=2048)
    return d, victim


def test_poison_row_is_quarantined_and_rest_matches_oracle(
        spark, poison_corpus, tmp_path_factory):
    from delver_spark.operators.crawl import CrawlEngine

    d, victim = poison_corpus
    oracle = run_oracle(d, poison_urls={victim})
    assert [q["url_canon"] for q in oracle.quarantine] == [victim]

    wd = str(tmp_path_factory.mktemp("crawl_poison"))
    eng = CrawlEngine(spark, d, wd)
    eng.run()

    q = eng.quarantine_df()
    assert list(q["url_canon"]) == [victim]
    assert len(q) == 1 and q["error"].iloc[0]  # error message recorded
    assert int(q["round"].iloc[0]) == oracle.quarantine[0]["round"]

    oo = [(r["seq"], r["url_canon"], r["round"], r["success"])
          for r in oracle.crawl_order]
    df = eng.crawl_order_df()
    so = list(df[["seq", "url_canon", "round", "success"]]
              .itertuples(index=False, name=None))
    assert so == oo
    # no markVisited for the poisoned page: bloom must equal the oracle's
    assert np.array_equal(oracle.bloom.bit_positions(),
                          eng.bloom.bit_positions())
    assert oracle.bloom.n == eng.bloom.n


def test_poison_changes_crawl_vs_clean(poison_corpus):
    """Non-vacuous: quarantining the page removes its outlinks from the
    frontier, so the crawl genuinely differs from the clean run."""
    d, victim = poison_corpus
    clean = run_oracle(d)  # no poison declared: oracle would extract it
    poisoned = run_oracle(d, poison_urls={victim})
    co = [(r["seq"], r["url_canon"]) for r in clean.crawl_order]
    po = [(r["seq"], r["url_canon"]) for r in poisoned.crawl_order]
    assert co != po


def test_poison_row_quarantined_on_big_g_distributed_path(
        spark, tmp_path_factory):
    """The distributed-artifact branch (big-G default) writes the
    quarantine parquet per round instead of buffering — same oracle
    equality, artifact read back through quarantine_df."""
    import shutil

    from delver_spark.fixtures.gen import generate_corpus
    from delver_spark.operators.crawl import CrawlEngine

    d = str(tmp_path_factory.mktemp("corpus_poison_bigg"))
    generate_corpus(d, n_pages=150, n_hosts=8, seed=11, max_rounds=4,
                    global_budget=20000, per_host_budget=50)
    clean = run_oracle(d)
    victim = next(r["url_canon"] for r in clean.crawl_order
                  if r["round"] >= 1 and r["success"])
    pages_path = os.path.join(d, "pages.parquet")
    tbl = pq.read_table(pages_path)
    urls = tbl.column("url_canon").to_pylist()
    blobs = tbl.column("bytes").to_pylist()
    blobs[urls.index(victim)] = b"\xff\xfe"
    cols = {name: tbl.column(name) for name in tbl.column_names}
    cols["bytes"] = pa.array(blobs, type=pa.binary())
    shutil.rmtree(pages_path) if os.path.isdir(pages_path) \
        else os.remove(pages_path)
    pq.write_table(pa.table(cols), pages_path, row_group_size=2048)

    oracle = run_oracle(d, poison_urls={victim})
    wd = str(tmp_path_factory.mktemp("crawl_poison_bigg"))
    eng = CrawlEngine(spark, d, wd)
    assert eng.collect_order is False  # big-G default: distributed artifacts
    eng.run()
    q = eng.quarantine_df()
    assert list(q["url_canon"]) == [victim]
    oo = [(r["seq"], r["url_canon"]) for r in oracle.crawl_order]
    df = eng.crawl_order_df()
    so = list(zip(df["seq"], df["url_canon"]))
    assert so == oo
    assert np.array_equal(oracle.bloom.bit_positions(),
                          eng.bloom.bit_positions())
