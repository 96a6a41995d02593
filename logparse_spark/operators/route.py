"""P5 route: fan-out by matched-rule family into per-family sinks.

Reference parity: the reference yields one event stream; its `north_rule`
extension routes rows by family with an `unknown` sink so no row is ever
dropped (systemlog.py tail rule [R-M]).

Design: ONE single-pass write with ``partitionBy('family', ...)`` —
Spark's dynamic partitioning fans out to every family in one job (no
per-family filter loop re-scanning the fact table N times).  With
dynamic partitionOverwriteMode, re-running a subset of partitions
overwrites only those partitions → idempotent resume (P9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SINK_PARTITIONS = ["family", "source", "bucket"]


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    """Stable doc_id bucket — the ledger/resume granularity key."""
    return df.withColumn("bucket", F.pmod(F.crc32(F.col("doc_id")), F.lit(n_buckets)).cast("int"))


def route(df: DataFrame, sinks_path: str, n_buckets: int = 4,
          write_salt: int = 2, cluster: bool | str = True,
          cluster_partitions: int | None = None,
          overwrite_mode: str = "dynamic") -> None:
    """Write the fan-out sinks in one pass, partitioned by family.

    `fields` (map) and `extra` (array) columns are parquet-native; the
    binding `tokens` column lands in every sink bit-identically.

    File-count discipline: without clustering, EVERY task writes a file
    into EVERY (family, source, bucket) dir it sees -> O(tasks x dirs)
    small files.  Repartitioning on the partition keys (+ a doc_id salt
    so one hot dir never pins a single task) bounds files per dir to
    `write_salt` and total files to dirs x salt — at 100 TB this is the
    difference between a working table and a small-files meltdown.

    `cluster="rebalance"` replaces the fixed salt with AQE's REBALANCE
    shuffle on the partition keys: runtime statistics split any dir
    whose bytes exceed `spark.sql.adaptive.advisoryPartitionSizeInBytes`
    into ~advisory-sized writers and pack the cold tail several dirs
    per task — i.e. files-per-dir tracks each dir's BYTES instead of a
    global constant, with no pre-pass over the data.  (Granularity
    caveat: AQE splits a skewed SHUFFLE partition by mapper range, so a
    cold dir co-hashed into a split slot pays one small file per slice
    — bounded by that slot's split count, never by the task count; at
    production advisory sizes this is a small constant on top of one
    file per dir.)  A fixed salt is wrong in both directions at large scale: the
    hottest family dir gets `write_salt` arbitrarily-large files while
    every cold dir pays `write_salt` tiny ones (the datagen v2-layout
    lesson, BENCH/RESULTS_r5.md §5b).  Below ~512 MB the salt path
    stays the default because AQE's coalescing caps write parallelism
    exactly when the whole input fits in a handful of advisory chunks
    (measured 13% slower at local[32] on 2M rows; see
    `cluster_partitions`).  `write_salt`/`cluster_partitions` are
    ignored in rebalance mode.

    `cluster=False` skips that shuffle: correct ONLY when the input is
    already laid out by (source, bucket) — e.g. scanning the production
    corpus, whose partition dirs align tasks with (source, bucket), so
    each task fans out to at most |families| dirs.  The stateless parse
    stage preserves partitioning 1:1, so the alignment survives it.

    `cluster_partitions` pins the clustering shuffle's partition count
    (default 2x defaultParallelism).  Without an explicit N, AQE
    coalesces the exchange toward 64 MB chunks — the same handful of
    write tasks at EVERY core count, which caps write parallelism and
    was measured 13% slower at local[32] on 2M rows.  File counts are
    unaffected: each (family, source, bucket, salt) combo hashes to one
    partition regardless of N.

    `overwrite_mode`: "dynamic" (default) is what makes PARTIAL reruns
    idempotent — re-writing a pending (source, bucket) subset replaces
    only those partition dirs (P9 resume).  A FRESH full run should pass
    "static": dynamic's commit stages every partition dir and the driver
    moves them one by one — measured ~3 s of serial driver time on a
    2,400-dir sink layout that static (truncate once, normal committer)
    does not pay.  Callers that resume keep dynamic.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", overwrite_mode)
    if "bucket" not in df.columns:
        df = with_bucket(df, n_buckets)
    if cluster == "rebalance":
        df = df.hint("rebalance", *SINK_PARTITIONS)
    elif cluster:
        n = cluster_partitions or spark.sparkContext.defaultParallelism * 2
        # salt hash MUST be independent of the bucket hash: bucket is
        # crc32(doc_id) % n_buckets, so crc32(doc_id) % write_salt is
        # CONSTANT within a dir whenever write_salt divides n_buckets —
        # i.e. the salt was inert and the hottest dir was written by one
        # task.  Salting a distinct string decorrelates the two.
        df = df.repartition(
            n,
            *[F.col(c) for c in SINK_PARTITIONS],
            F.pmod(F.crc32(F.concat(F.col("doc_id"), F.lit("#w"))), F.lit(write_salt)),
        )
    df.write.mode("overwrite").partitionBy(*SINK_PARTITIONS).parquet(sinks_path)


def compact_sinks(spark: SparkSession, sinks_path: str,
                  write_salt: int = 1,
                  cluster_partitions: int | None = None,
                  cluster: bool | str = True) -> dict:
    """Post-ingest small-file compaction — the maintenance job every
    partitioned production table needs: N streaming/incremental writes
    leave `salt x runs` files per (family, source, bucket) dir; this
    rewrites each dir's files into `write_salt` (default 1) without
    changing a single row.  (`cluster="rebalance"` passes through to
    route(): at 100 TB a compaction wants advisory-sized files per dir,
    not a fixed count.)

    Mechanics: one clustered read-rewrite into a staging dir (the same
    single-pass partitionBy shape as route(), static overwrite — this
    is a full rewrite), then a two-rename directory swap.  Readers see
    a consistent tree — old or new, never a mix — but POSIX rename
    cannot exchange two paths atomically, so there is a brief window
    where `sinks_path` is absent (a concurrent reader errors rather
    than reads garbage), and a crash inside the window leaves the data
    intact under `<path>__precompact` for manual recovery.  At 100 TB
    this is the Iceberg `rewrite_data_files` action, whose metadata
    commit closes exactly this gap; on plain parquet dirs the swap is
    the best available transactional boundary.

    Returns {files_before, files_after, rows}.
    """
    import shutil

    def _data_files(p: str) -> int:
        return sum(1 for _, _, fs in os.walk(p)
                   for f in fs if not f.startswith(("_", ".")))

    df = spark.read.option("basePath", sinks_path).parquet(sinks_path)
    rows = df.count()
    before = _data_files(sinks_path)
    staging = sinks_path.rstrip("/") + "__compacting"
    shutil.rmtree(staging, ignore_errors=True)
    route(df, staging, write_salt=write_salt, cluster=cluster,
          cluster_partitions=cluster_partitions, overwrite_mode="static")
    old = sinks_path.rstrip("/") + "__precompact"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(sinks_path, old)
    try:
        os.rename(staging, sinks_path)
    except OSError:
        os.rename(old, sinks_path)  # roll back: old tree restored
        shutil.rmtree(staging, ignore_errors=True)  # no stranded staging
        raise
    shutil.rmtree(old, ignore_errors=True)
    return {"files_before": before, "files_after": _data_files(sinks_path),
            "rows": rows}


def read_sink(spark: SparkSession, sinks_path: str, family: str | None = None) -> DataFrame:
    df = spark.read.option("basePath", sinks_path).parquet(sinks_path)
    return df.where(F.col("family") == family) if family else df


def list_families(sinks_path: str) -> list[str]:
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(sinks_path)
        if d.startswith("family=")
    )
