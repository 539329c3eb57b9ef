"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame plans (Catalyst-optimizable, no Python in
the hot path) built on hash functions available in both Spark and ANSI SQL
(md5), so each has an exact DuckDB oracle twin in __spark_entry__.py.

Scale notes (100 TB corpus):
  - exact/fingerprint dedup: one hash-shuffle on the fingerprint;
  - MinHash+LSH: tokens explode → per-(doc, perm) min — map-side partial
    aggregation keeps the shuffle at |docs|×perms rows; band self-join is
    a shuffle on (band_id, band_val) whose skew mirrors true duplicate
    clusters (salt if a cluster exceeds a partition);
  - SimHash: same explode shape, 16-bit signature → bucket-join on the
    signature;
  - n-gram Jaccard: shared-shingle join (never a cross join) — candidates
    only where at least one shingle collides;
  - embedding cosine: exact int dot products over quantized vectors; at
    scale, pre-bucket by IVF cell (see similarity.py) before pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
           distinct: bool = True) -> DataFrame:
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    if distinct:
        toks = F.array_distinct(toks)
    return df.select(id_col, F.explode(toks).alias("tok"))


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(fingerprint, keeper, n_dupes): md5 grouping, min-id keeper."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
            .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_dupes"))
            .orderBy("fingerprint"))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = 8,
                      band_size: int = 2) -> DataFrame:
    """Near-dup candidate pairs via md5-minhash signatures + banded LSH."""
    spark = df.sparkSession
    toks = tokens(df, id_col, text_col)
    perms = spark.range(n_hashes).withColumnRenamed("id", "perm")
    h = (toks.crossJoin(F.broadcast(perms))
         .withColumn("h", F.md5(F.concat(F.col("perm").cast("string"),
                                         F.lit(":"), F.col("tok")))))
    sig = h.groupBy(id_col, "perm").agg(F.min("h").alias("mh"))
    parts = [F.max(F.when(F.col("perm") % band_size == i, F.col("mh")))
             for i in range(band_size)]
    band = (sig.withColumn("band_id", F.floor(F.col("perm") / band_size).cast("int"))
            .groupBy(id_col, "band_id")
            .agg(F.concat_ws("|", *parts).alias("band_val")))
    a = band.select(F.col(id_col).alias("doc_a"), "band_id", "band_val")
    b = band.select(F.col(id_col).alias("doc_b"),
                    F.col("band_id").alias("band_id_b"),
                    F.col("band_val").alias("band_val_b"))
    return (a.join(b, (a.band_id == b.band_id_b)
                   & (a.band_val == b.band_val_b)
                   & (a.doc_a < b.doc_b))
            .select("doc_a", "doc_b").distinct().orderBy("doc_a", "doc_b"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold_milli: int = 300) -> DataFrame:
    """Exact word-bigram Jaccard over a shared-shingle join."""
    toks = df.select(id_col, F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != "").alias("ts"))
    sh = (toks.select(id_col, F.explode(F.array_distinct(
        F.zip_with(F.col("ts"), F.slice(F.col("ts"), 2, 1 << 20),
                   lambda x, y: F.concat(x, F.lit(" "), y)))).alias("shingle"))
          .filter(F.col("shingle").isNotNull()))  # zip_with pads tail with null
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("shingle").alias("shingle_b"))
    inter = (a.join(b, (a.shingle == b.shingle_b) & (a.doc_a < b.doc_b))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    jacc = F.round(F.col("inter") * 1000.0
                   / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).cast("long")
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jacc_milli", jacc)
            .filter(F.col("jacc_milli") >= threshold_milli)
            .select("doc_a", "doc_b", "inter", "jacc_milli")
            .orderBy("doc_a", "doc_b"))


def simhash16(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """16-bit SimHash from the first 4 hex digits of md5(token): bit b is
    the sign of the token-vote sum. Pure SQL-expressible bit arithmetic."""
    toks = tokens(df, id_col, text_col)
    e = (toks.withColumn("h4", F.substring(F.md5(F.col("tok")), 1, 4))
         .select(id_col, "h4", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("pos"))
         .withColumn("contrib", F.expr(
             "2 * (shiftright(instr('0123456789abcdef',"
             " substr(h4, CAST(pos/4 AS INT) + 1, 1)) - 1,"
             " CAST(3 - pos % 4 AS INT)) & 1) - 1")))
    votes = e.groupBy(id_col, "pos").agg(F.sum("contrib").alias("s"))
    return (votes.groupBy(id_col)
            .agg(F.expr("CAST(sum(CASE WHEN s > 0 THEN"
                        " shiftleft(1, CAST(pos AS INT)) ELSE 0 END) AS BIGINT)")
                 .alias("simhash16"))
            .orderBy(id_col))


def embedding_cosine_pairs(emb: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold_milli: int = 950) -> DataFrame:
    """Embedding near-dup pairs: exact int-quantized dot products; cosine
    from one sqrt over exact integer norms (identical IEEE ops in any
    engine). At scale restrict pairing to an IVF cell first."""
    q = emb.select(
        id_col,
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * 1000).cast("long")).alias("q"))
    a = q.select(F.col(id_col).alias("doc_a"), F.col("q").alias("qa"))
    b = q.select(F.col(id_col).alias("doc_b"), F.col("q").alias("qb"))
    dot = F.aggregate(F.zip_with("qa", "qb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    norm = F.aggregate(F.transform("qa", lambda x: x * x),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)
    normb = F.aggregate(F.transform("qb", lambda x: x * x),
                        F.lit(0).cast("long"), lambda acc, x: acc + x)
    pairs = (a.join(b, F.col("doc_a") < F.col("doc_b"))
             .withColumn("dot", dot)
             .withColumn("na", norm)
             .withColumn("nb", normb)
             .withColumn("cos_milli",
                         F.round(F.col("dot") * 1000.0
                                 / F.sqrt((F.col("na") * F.col("nb")).cast("double")))
                         .cast("long")))
    return (pairs.filter(F.col("cos_milli") >= threshold_milli)
            .select("doc_a", "doc_b", "cos_milli").orderBy("doc_a", "doc_b"))
