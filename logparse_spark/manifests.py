"""P8 lineage manifests + global metrics.

Per-partition lineage: one JSON-serializable row per (source, bucket)
with input rows, routed rows, the rule histogram, and a content
checksum — enough to audit that every input row landed in exactly one
sink and to diff two runs without re-reading the sinks.

Global counters use the DataFrame ``Observation`` API (the modern,
structured replacement for raw accumulators): metrics ride the same
action that writes the sinks — zero extra passes over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach global pipeline counters; read obs.get after the write action."""
    obs = Observation("pipeline")
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("routed_rows"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.when(F.col("rule_id") == -1, 1).otherwise(0)).alias("unknown_rows"),
            # DISTINCT is not allowed in observed metrics; approx_ is
            F.approx_count_distinct("family").alias("families"),
        ),
        obs,
    )


def partition_manifests(parsed: DataFrame, grain: DataFrame | None = None) -> DataFrame:
    """Per-(source,bucket) lineage row: counts, rule histogram, checksum.

    checksum = sum of crc32(doc_id||rule_id) — order-insensitive,
    overflow-safe at any scale (bigint sum of 32-bit values), and
    sensitive to both membership and per-row rule assignment.

    Derives from the (cached) grain_counts table when supplied — no
    extra pass over the routed data.
    """
    from logparse_spark.operators.aggregate import grain_counts

    if grain is None:
        grain = grain_counts(parsed)
    per_rule = grain.groupBy("source", "bucket", "rule_id").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("tok").alias("tok"),
        F.sum("chk").alias("chk"),
    )
    return per_rule.groupBy("source", "bucket").agg(
        F.sum("cnt").alias("routed_rows"),
        F.sum("tok").alias("total_tokens"),
        F.sum(F.when(F.col("rule_id") == -1, F.col("cnt")).otherwise(0)).alias("unknown_rows"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("rule_id").cast("string"), F.col("cnt"))))
        ).alias("rule_histogram"),
        F.sum("chk").alias("checksum"),
    )


def write_manifests(parsed: DataFrame, path: str, grain: DataFrame | None = None) -> None:
    mf = partition_manifests(parsed, grain)
    # JSON lines: small (one row per partition key), human-auditable
    mf.select(F.to_json(F.struct(*mf.columns)).alias("manifest")).coalesce(1).write.mode(
        "overwrite"
    ).text(path)
