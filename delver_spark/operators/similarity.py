"""Similarity search over embedding columns (array<float>).

Brute-force exact top-k is the baseline; the scale path restricts the
scan to IVF cells (a coarse quantizer column — here the pre-assigned
``label``; in production, k-means cell ids maintained the same way).
Quantization to int-milli makes scores exact integers → deterministic
ranking and cross-engine hash equality.

At 100 TB: the embedding table is bucketed by cell id; a top-k probe scans
only ``n_probe`` cells (partition pruning on the cell column), and the
per-partition top-k merge is Spark's TakeOrdered — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize(emb: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding", extra_cols: tuple = ("label",)) -> DataFrame:
    return emb.select(
        id_col, *extra_cols,
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * 1000).cast("long")).alias("q"))


def _dot(a: str, b: str):
    return F.aggregate(F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


def cosine_topk_bruteforce(emb: DataFrame, query_id: int, k: int = 10,
                           id_col: str = "vec_id") -> DataFrame:
    """Exact integer dot-product top-k against one query vector."""
    q = quantize(emb, id_col)
    query = q.filter(F.col(id_col) == query_id).select(F.col("q").alias("qq"))
    return (q.crossJoin(F.broadcast(query))
            .filter(F.col(id_col) != query_id)
            .select(id_col, _dot("q", "qq").alias("dot_milli2"))
            .orderBy(F.desc("dot_milli2"), id_col).limit(k))


def cosine_topk_ivf(emb: DataFrame, query_id: int, k: int = 5,
                    id_col: str = "vec_id", cell_col: str = "label",
                    n_probe: int = 1) -> DataFrame:
    """IVF probe that actually prunes: the query row's cell (and, for
    ``n_probe > 1``, the next-nearest cells by centroid dot product) is
    resolved DRIVER-SIDE (one 1-row lookup job), then applied as a literal
    IN-filter — so the cell predicate pushes into the parquet scan
    (PushedFilters on the cell column; pinned by
    tests/test_plans.py::test_ivf_cell_filter_pushes_to_scan) instead of
    post-filtering a full-table crossJoin. At 100 TB the embedding table
    is partitioned/bucketed by cell id and this literal filter becomes
    partition pruning: only ``n_probe`` cells are read at all."""
    q = quantize(emb, id_col, extra_cols=(cell_col,))
    qrow = q.filter(F.col(id_col) == query_id) \
        .select("q", cell_col).first()
    qvec, qcell = list(qrow["q"]), qrow[cell_col]
    cells = [qcell]
    if n_probe > 1:
        # rank the OTHER cells by the EXACT integer dot product between
        # the query and each cell's SUMMED vector (one tiny agg over
        # (cell, dim), driver-collected). Unnormalized sums instead of
        # float centroids keep the ranking engine-exact (a DuckDB twin
        # computes bit-identical longs; float-averaged centroids would
        # tie-break on summation order) at the cost of a documented bias
        # toward larger cells; ties break on the cell id.
        cen = (q.filter(F.col(cell_col) != qcell)
               .select(cell_col, F.posexplode("q").alias("i", "v"))
               .groupBy(cell_col, "i").agg(F.sum("v").alias("s"))
               .collect())
        score: dict = {}
        for r in cen:
            score[r[cell_col]] = score.get(r[cell_col], 0) \
                + int(r["s"]) * int(qvec[r["i"]])
        ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
        cells += [c for c, _ in ranked][: n_probe - 1]
    qq = F.array(*[F.lit(int(v)) for v in qvec])
    return (q.filter(F.col(cell_col).isin(cells) & (F.col(id_col) != query_id))
            .select(id_col, cell_col,
                    F.aggregate(F.zip_with(F.col("q"), qq, lambda x, y: x * y),
                                F.lit(0).cast("long"),
                                lambda acc, x: acc + x).alias("dot_milli2"))
            .orderBy(F.desc("dot_milli2"), id_col).limit(k))
