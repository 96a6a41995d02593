"""Per-stage scaling profile: where does the local[32] leg lose vs
local[16]?  Times each pipeline prefix on the same pre-materialized
corpus (1 warm-up discarded, median of `runs`).

Usage: python tools/profile_scaling.py [rows] [cores ...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from bench import ensure_corpus, run_pipeline_once  # noqa: E402
from logparse_spark.session import get_spark  # noqa: E402


def timed(fn, runs=2):
    fn()  # warm-up
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 2)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores_list = [int(c) for c in sys.argv[2:]] or [16, 32]

    s0 = get_spark(app_name="profile-datagen", cores=32)
    corpus = ensure_corpus(s0, rows)
    s0.stop()

    from logparse_spark.engine import parse_sequences
    from logparse_spark.operators.enrich import enrich, rules_dim
    from logparse_spark.sources.datagen import nodes_dim

    out = {}
    for cores in cores_list:
        s = get_spark(
            app_name=f"profile-{cores}", cores=cores, shuffle_partitions=cores,
            extra={"spark.sql.files.maxPartitionBytes": "16m",
                   "spark.task.cpus": "2"},
        )
        seq = s.read.parquet(corpus).drop("bucket")
        legs = {}
        legs["scan_noop"] = timed(lambda: noop(seq))
        legs["parse_noop"] = timed(lambda: noop(parse_sequences(seq)))
        legs["parse_enrich_noop"] = timed(
            lambda: noop(enrich(parse_sequences(seq), nodes_dim(s), rules_dim(s)))
        )
        legs["full_pipeline"] = timed(
            lambda: run_pipeline_once(s, corpus, f"/tmp/lp_prof_{cores}")[0], runs=2
        )
        out[cores] = legs
        print(json.dumps({cores: legs}), flush=True)
        s.stop()
    print("RESULT", json.dumps(out))


if __name__ == "__main__":
    main()
