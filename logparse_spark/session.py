"""SparkSession factory tuned for the pipeline.

Scale notes (100 TB / 1000 executors): every config here is either
cluster-neutral (AQE, Arrow, UTC) or derived from core count at runtime.
Nothing hard-codes local-mode assumptions except the ``master`` default,
which spark-submit overrides.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "logparse-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the pipeline's standard confs.

    - AQE on (runtime shuffle coalesce + skew-join split: half of the
      skew story, see operators/skew.py for the salted other half).
    - Arrow on with a bounded batch size so the mapInPandas parse stage
      streams fixed-size batches instead of whole partitions.
    - Session timezone pinned UTC: fixture timestamps are naive UTC and
      the DuckDB oracle compares naive values.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = os.environ.get("SPARK_MASTER", f"local[{cores}]" if cores else "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = cores if cores else (os.cpu_count() or 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # parquet scan granularity: at 100 TB this keeps ~128MB splits;
        # harmless at test scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        # v2 committer: task-side renames (parallel) instead of a
        # sequential driver-side commit — with thousands of sink
        # partition dirs the v1 commit is a serial bottleneck
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # JVM<->Python-worker channel over a UNIX domain socket instead
        # of loopback TCP (Spark 4.1 feature, default off).  Worker
        # links are same-host by construction on any deployment, so UDS
        # is cluster-neutral; it removes TCP congestion control from a
        # kernel-internal pipe.  Measured need, r7: with the host's
        # loopback under bbr, the arrow parse stage repeatedly WEDGED
        # mid-task — worker blocked in tcp_sendmsg (sk_stream_wait_
        # memory), JVM reader epolling with a 33 MB full receive queue,
        # rto backed off to 104 s (cwnd:1, backoff:9, lost segments on
        # lo) — a bidirectional flow-control stall that UDS cannot
        # enter (no cwnd, no retransmission on AF_UNIX).  Two full
        # 20M-row pipeline runs hung at the same shape without it; with
        # it, repeated runs complete.  SPARK_GRAFT_PY_UDS=0 restores
        # TCP for A/B.
        .config("spark.python.unix.domain.socket.enabled",
                os.environ.get("SPARK_GRAFT_PY_UDS", "1") != "0" and "true" or "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
