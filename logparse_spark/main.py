"""spark-submit entrypoint (P10): the full parse -> enrich -> route ->
aggregate pipeline with skew salting, lineage manifests, Observation
metrics and ledger-based idempotent resume.

    spark-submit --py-files logparse_spark.zip -m logparse_spark.main \
        --input /data/sequences --out /data/pipeline_out

Local / sandbox:

    python -m logparse_spark.main --rows 200000 --out /tmp/lp_out --cores 32

Driver-side logic is deliberately thin: build the plan declaratively,
trigger ONE write action per output, collect only the Observation
scalars and the tiny ledger/manifest tables.  No .collect() over data.
"""

from __future__ import annotations

import argparse
import json
import os
import time
import uuid

from pyspark.sql import functions as F

from logparse_spark.engine import parse_sequences
from logparse_spark.ledger import Ledger
from logparse_spark.manifests import observed, partition_manifests, write_manifests
from logparse_spark.operators.aggregate import write_metrics
from logparse_spark.operators.enrich import enrich, rules_dim
from logparse_spark.operators.route import route, with_bucket
from logparse_spark.operators.skew import salted_repartition
from logparse_spark.session import get_spark
from logparse_spark.sources.datagen import generate_sequences, nodes_dim, write_sequences


def run_pipeline(
    spark,
    sequences_df,
    out: str,
    n_buckets: int = 4,
    resume: bool = True,
    salt: int = 8,
    repartition_to: int | None = None,
    fail_after_partitions: int | None = None,
) -> dict:
    """Run the full pipeline; returns the Observation metrics dict.

    `fail_after_partitions` (tests only) processes just K pending
    partitions then stops — simulating a mid-run crash for resume tests.
    """
    run_id = uuid.uuid4().hex[:12]
    t0 = time.time()

    df = with_bucket(sequences_df, n_buckets)
    ledger = Ledger(spark, f"{out}/ledger")
    if resume:
        pending = ledger.pending(df)
        if fail_after_partitions is not None:
            pending = spark.createDataFrame(
                pending.limit(fail_after_partitions).collect(),
                "source string, bucket int",
            )
        # broadcast anti/semi keeps the big side shuffle-free; at 10^12
        # rows the same predicate prunes parquet partitions at scan time
        df = df.join(F.broadcast(pending), ["source", "bucket"], "left_semi")

    if repartition_to:
        df = salted_repartition(df, repartition_to, salt=salt)

    parsed = parse_sequences(df)
    enriched = enrich(parsed, nodes_dim(spark), rules_dim(spark))
    enriched, obs = observed(enriched)

    route(enriched, f"{out}/sinks", n_buckets=n_buckets)  # the one big action
    metrics = dict(obs.get)

    # small follow-up aggregates re-read the (columnar, partition-pruned)
    # sinks rather than recompute the parse
    routed = spark.read.option("basePath", f"{out}/sinks").parquet(f"{out}/sinks")
    write_metrics(routed, f"{out}/metrics")
    write_manifests(routed, f"{out}/manifests")
    ledger.commit(
        partition_manifests(routed).select("source", "bucket", F.col("routed_rows").alias("rows")),
        run_id,
    )

    metrics["wall_sec"] = time.time() - t0
    metrics["run_id"] = run_id
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser(description="logparse_spark pipeline")
    ap.add_argument("--input", help="path to sequences parquet (else synthetic)")
    ap.add_argument("--rows", type=int, default=100_000, help="synthetic row count")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=4)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    spark = get_spark(cores=args.cores)
    if args.input:
        seq = spark.read.parquet(args.input)
        if "bucket" in seq.columns:
            seq = seq.drop("bucket")  # recomputed from doc_id (layout-independent)
    else:
        data_path = f"{args.out}/sequences"
        if not os.path.isdir(data_path):
            write_sequences(spark, data_path, args.rows, seed=args.seed, n_buckets=args.buckets)
        seq = spark.read.parquet(data_path).drop("bucket")

    metrics = run_pipeline(
        spark, seq, args.out, n_buckets=args.buckets,
        resume=not args.no_resume, salt=args.salt,
    )
    print(json.dumps(metrics, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
