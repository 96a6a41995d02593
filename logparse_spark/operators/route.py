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


def route(df: DataFrame, sinks_path: str, n_buckets: int = 4) -> None:
    """Write the fan-out sinks in one pass, partitioned by family.

    `fields` (map) and `extra` (array) columns are parquet-native; the
    binding `tokens` column lands in every sink bit-identically.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if "bucket" not in df.columns:
        df = with_bucket(df, n_buckets)
    df.write.mode("overwrite").partitionBy(*SINK_PARTITIONS).parquet(sinks_path)


def read_sink(spark: SparkSession, sinks_path: str, family: str | None = None) -> DataFrame:
    df = spark.read.option("basePath", sinks_path).parquet(sinks_path)
    return df.where(F.col("family") == family) if family else df


def list_families(sinks_path: str) -> list[str]:
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(sinks_path)
        if d.startswith("family=")
    )
