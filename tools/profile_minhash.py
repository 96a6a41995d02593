"""Stage-level decomposition of the minhash/clusters queries (r7 aid).

Times, in one session at a given sf dir:
  banded signatures | candidates | full minhash_near_dups | CC alone |
  full dedup_clusters

Usage: python tools/profile_minhash.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from logparse_spark.operators import dedup as dd
    from logparse_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile-minhash", cores=cpus,
                      extra={"spark.sql.files.maxPartitionBytes": "16m",
                             "spark.task.cpus": "2"})
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def t(label, mk):
        spark.sparkContext.setJobDescription(label)
        for i in range(runs):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            print(f"{label:34s} run{i} {time.time() - t0:7.2f}s", flush=True)

    kw = dict(num_hashes=84, bands=28, shingle_n=3, seed=42)
    t("banded", lambda: dd._minhash_banded(docs, "text", "doc_id",
                                           84, 28, 3, 42, "np"))
    t("candidates", lambda: dd.minhash_lsh_candidates(
        docs, "text", "doc_id", 84, 28, 3, 42, "np", None))
    t("minhash_near_dups", lambda: dd.minhash_near_dups(
        docs, threshold=0.8, **kw))
    edges = dd.minhash_near_dups(docs, threshold=0.8, **kw).localCheckpoint()
    spark.sparkContext.setJobDescription("cc-alone")
    for i in range(runs):
        t0 = time.time()
        dd.connected_components(edges).write.format("noop").mode("overwrite").save()
        print(f"{'cc alone (edges checkpointed)':34s} run{i} {time.time() - t0:7.2f}s",
              flush=True)
    t("dedup_clusters full", lambda: dd.dedup_clusters(
        docs, threshold=0.8, **kw))
    spark.stop()


if __name__ == "__main__":
    main()
