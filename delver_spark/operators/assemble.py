"""End-to-end training-set assembly: the capstone composition of the
corpus-hygiene, dedup, decontamination, and sampling operators into ONE
declarative plan with per-document drop observability.

Stage order (the standard web-corpus pipeline: filter cheap before
shuffling expensive):

  1. repetition   Gopher repetition filters (textstats.repetition_stats)
                  — pure projection, no shuffle
  2. exact_dup    exact dedup: one keeper per md5(text) fingerprint by
                  (quality desc, id) — one hash-shuffle window over
                  stage-1 survivors only
  3. contaminated word-n-gram benchmark decontamination
                  (textstats.ngram_decontaminate) — broadcast joins
                  both ways, corpus never shuffled
  4. quota        per-language top-N balancing — one window over
                  survivors (salt the dominant language upstream with
                  textstats.language_quota for skewed corpora)
  5. sample       deterministic md5 hash-rate down-sampling — stateless
                  filter, partition-invariant

Every input row comes back with ``drop_stage`` (null = kept in the
final set), so corpus loss is auditable per stage with one
``groupBy("drop_stage").count()`` (see ``assembly_report``). Stages
apply in order: a doc dropped at stage k is invisible to stages > k
(the window-partition pass-flag trick keeps that exact while remaining
a single plan — no intermediate materializations, two window shuffles +
one broadcast join total at any corpus size).

PII is deliberately counted, not dropped (redaction, not removal, is
the training-pipeline norm): compose textstats.pii_scrub /
scrubbed_text on the kept set to rewrite the text. Substring-level
dedup likewise composes as a PRE-step (it rewrites text instead of
dropping docs): dedup.duplicate_spans -> dedup.cut_spans before
assembly, so the repetition/dedup stages here see the cut text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import textstats as _txt

DROP_STAGES = ("repetition", "exact_dup", "contaminated", "quota", "sample")


def assemble_training_set(docs: DataFrame, bench: DataFrame | None = None,
                          *, per_lang: int | None = None,
                          rate_milli: int | None = None,
                          ngram_n: int = 5,
                          id_col: str = "doc_id", text_col: str = "text",
                          lang_col: str = "lang",
                          quality_col: str = "n_chars") -> DataFrame:
    """Run the 5-stage assembly; returns every input row + ``drop_stage``
    (null = kept). ``bench``/``per_lang``/``rate_milli`` are optional —
    omitted stages pass everything through."""
    d = _txt.repetition_stats(docs, id_col=id_col, text_col=text_col,
                              append=True)
    d = d.withColumn("_s1", F.col("keep"))

    # stage 2: exact-dup keeper among stage-1 survivors; partitioning by
    # (_s1, fingerprint) keeps dropped rows out of the ranking
    w2 = Window.partitionBy("_s1", F.md5(F.col(text_col))).orderBy(
        F.desc(quality_col), F.asc(id_col))
    d = d.withColumn("_s2", F.col("_s1") & (F.row_number().over(w2) == 1))

    # stage 3: contaminated ids arrive as a broadcast-joined flag
    if bench is not None:
        hits = (_txt.ngram_decontaminate(docs, bench, n=ngram_n,
                                         id_col=id_col, text_col=text_col)
                .filter("contaminated").select(id_col, "contaminated"))
        d = (d.join(F.broadcast(hits), id_col, "left")
             .withColumn("_s3", F.col("_s2")
                         & F.col("contaminated").isNull())
             .drop("contaminated"))
    else:
        d = d.withColumn("_s3", F.col("_s2"))

    if per_lang is not None:
        w4 = Window.partitionBy("_s3", lang_col).orderBy(
            F.desc(quality_col), F.asc(id_col))
        d = d.withColumn("_s4", F.col("_s3")
                         & (F.row_number().over(w4) <= per_lang))
    else:
        d = d.withColumn("_s4", F.col("_s3"))

    if rate_milli is not None:
        bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                                    1, 8), 16, 10).cast("long")
        d = d.withColumn("_s5", F.col("_s4")
                         & (bucket * 1000 < F.lit(rate_milli) * (1 << 32)))
    else:
        d = d.withColumn("_s5", F.col("_s4"))

    stage = (F.when(~F.col("_s1"), "repetition")
             .when(~F.col("_s2"), "exact_dup")
             .when(~F.col("_s3"), "contaminated")
             .when(~F.col("_s4"), "quota")
             .when(~F.col("_s5"), "sample"))
    keep_cols = [c for c in d.columns if not c.startswith("_")]
    return d.select(*keep_cols, stage.alias("drop_stage"))


def assembly_report(assembled: DataFrame) -> DataFrame:
    """Per-stage loss accounting over assemble_training_set output:
    (drop_stage, n) with null = the final kept count."""
    return (assembled.groupBy("drop_stage")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("drop_stage").asc_nulls_first()))
