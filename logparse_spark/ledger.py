"""P9 checkpoint ledger: partition-granular idempotent resume.

A tiny append-only parquet log keyed by (source, bucket).  On start,
pending = input partitions LEFT ANTI JOIN committed partitions; after
the sink write succeeds for a batch, one commit batch is appended.
Re-running a committed partition is a no-op at the ledger level and an
idempotent overwrite at the sink level (dynamic partition overwrite).

Scale: at 10^12 rows with (50 sources x 1024 buckets) the ledger is
~50k rows — driver-trivial, broadcast-trivial; the anti-join prunes the
SCAN via partition pruning on (source, bucket) before any work happens.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = "source string, bucket int, status string, rows long, committed_at double, run_id string"


class Ledger:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def done(self) -> DataFrame:
        """Committed (source, bucket) pairs."""
        if not self._exists():
            return self.spark.createDataFrame([], "source string, bucket int")
        return (
            self.spark.read.parquet(self.path)
            .where(F.col("status") == "done")
            .select("source", "bucket")
            .distinct()
        )

    def pending(self, all_partitions: DataFrame) -> DataFrame:
        """all (source,bucket) minus committed — the resume frontier."""
        return all_partitions.select("source", "bucket").distinct().join(
            F.broadcast(self.done()), ["source", "bucket"], "left_anti"
        )

    def commit(self, partition_counts: DataFrame, run_id: str) -> None:
        """Append done-markers (one row per partition) AFTER sinks landed."""
        rows = (
            partition_counts.select("source", "bucket", "rows")
            .withColumn("status", F.lit("done"))
            .withColumn("committed_at", F.lit(time.time()))
            .withColumn("run_id", F.lit(run_id))
            .select("source", "bucket", "status", "rows", "committed_at", "run_id")
        )
        rows.coalesce(1).write.mode("append").parquet(self.path)
