"""Direct payload scan (big-G fetch path): hit coverage and duplicate
dequeues of the same url (frontier can hold a url twice — reference
same-page duplicate admission quirk)."""

import os

import pyarrow as pa


def _keys(rows):
    return pa.table({
        "url": [r[0] for r in rows],
        "pos": pa.array([r[1] for r in rows], pa.int64()),
        "depth": pa.array([r[2] for r in rows], pa.int32()),
        "host": [r[3] for r in rows],
    })


def test_direct_scan_duplicate_keys(spark, unit_corpus):
    import pyarrow.parquet as pq

    from delver_spark.engine.urlnorm import host_of
    from delver_spark.sources.payload_scan import fetch_extract_direct

    pages = pq.read_table(os.path.join(unit_corpus, "pages.parquet"),
                          columns=["url_canon"])
    urls = sorted(pages.column("url_canon").to_pylist())[:3]
    # u0 dequeued TWICE (pos 0 and 2), u1/u2 once
    rows = [(urls[0], 0, 0, host_of(urls[0])),
            (urls[1], 1, 0, host_of(urls[1])),
            (urls[0], 2, 1, host_of(urls[0])),
            (urls[2], 3, 0, host_of(urls[2]))]
    df, bc = fetch_extract_direct(
        spark, os.path.join(unit_corpus, "pages.parquet"), _keys(rows), 8)
    got = sorted((r["pos"], r["url_canon"], r["depth"])
                 for r in df.select("pos", "url_canon", "depth").collect())
    bc.destroy()
    assert got == [(0, urls[0], 0), (1, urls[1], 0),
                   (2, urls[0], 1), (3, urls[2], 0)]
