"""P7 skew handling: AQE skew-join split (session.py turns it on) plus
explicit salted repartition for zipf-hot sources.

AQE fixes skewed *shuffle joins* at runtime; the fan-out write and the
Arrow parse stage want pre-balanced input too — a hot source (zipf s=1.2
means node-000 alone is ~15% of rows) would otherwise pin one task.
Salting: repartition on (source, crc32(doc_id) % salt) spreads each hot
source over `salt` tasks while keeping cold sources clustered.

Detection is measured, not guessed: a cheap count-by-source (tiny
output; at 10^12 rows run it on a sample or reuse ledger stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_sources(df: DataFrame, threshold_frac: float = 0.05, sample_frac: float | None = None) -> list[str]:
    """Sources holding more than `threshold_frac` of rows (sampled if asked)."""
    probe = df.sample(sample_frac) if sample_frac else df
    counts = probe.groupBy("source").agg(F.count("*").alias("cnt"))
    total = probe.count()
    if total == 0:
        return []
    return [
        r["source"]
        for r in counts.where(F.col("cnt") > threshold_frac * total).collect()
    ]


def salted_repartition(df: DataFrame, num_partitions: int, salt: int = 8) -> DataFrame:
    """Spread rows over (source, salt) so no single source pins a task.

    crc32(doc_id) is deterministic — the same row always lands in the
    same salt slot, keeping re-runs stable for the resume ledger.
    """
    return df.repartition(
        num_partitions,
        F.col("source"),
        F.pmod(F.crc32(F.col("doc_id")), F.lit(salt)),
    )
