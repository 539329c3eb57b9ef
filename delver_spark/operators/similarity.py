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
                    id_col: str = "vec_id", cell_col: str = "label") -> DataFrame:
    """IVF-style probe: search only the query's coarse cell."""
    q = quantize(emb, id_col, extra_cols=(cell_col,))
    query = q.filter(F.col(id_col) == query_id).select(
        F.col("q").alias("qq"), F.col(cell_col).alias("qcell"))
    return (q.crossJoin(F.broadcast(query))
            .filter((F.col(cell_col) == F.col("qcell"))
                    & (F.col(id_col) != query_id))
            .select(id_col, cell_col, _dot("q", "qq").alias("dot_milli2"))
            .orderBy(F.desc("dot_milli2"), id_col).limit(k))
