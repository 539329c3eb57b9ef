"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(app_name: str = "delver_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """local[cpus] session; AQE + Arrow on. ``cpus`` defaults to
    $SPARK_GRAFT_CPUS (or all cores). On a real cluster the same settings
    apply minus the master override (spark-submit provides it)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)
    # make the package importable in executor python workers regardless of
    # the driver's cwd (cluster deployments ship it via --py-files instead)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(":"):
        os.environ["PYTHONPATH"] = f"{repo_root}:{pp}" if pp else repo_root
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # small split size: payload scans parallelize across row groups
        # (tunable; payload-heavy jobs want fine splits for balance)
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "33554432"))
        .getOrCreate()
    )


@contextmanager
def scoped_arrow_batch(spark: SparkSession, n: int = 256):
    """Scope ``spark.sql.execution.arrow.maxRecordsPerBatch`` around an
    ACTION on payload-carrying Arrow UDF plans — THE canonical home of
    the 256-row payload-batch rule (used by the crawl fetch and the
    image resize path; see CLAUDE.md). At ~10 KB+ binary rows the
    default 10k-row Arrow batch makes the JVM build huge humongous
    allocations per in-flight task batch and row→Arrow conversion
    collapses to ~40-90 MB/s aggregate (256-row batches measured 3.5×
    faster end-to-end on the crawl fetch; the 40k×≤384px resize bench
    ANTI-scaled 2→8 cores until scoped). The conf is read at job
    submission, so this must wrap the collect/write, not the plan
    construction; restore runs in finally so a failed job can't leak
    the small batch size into later queries on the shared session."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    spark.conf.set(conf, str(n))
    try:
        yield
    finally:
        spark.conf.set(conf, old)
