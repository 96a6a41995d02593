"""Plan + timing audit of EVERY declared query in __spark_entry__.py.

For each query: capture .explain('formatted'), scan for red flags
(row-Python eval nodes, cartesian products, missing parquet filter
pushdown where a filter exists, single-task map stages on the
single-row-group testdata files), and time it against the noop sink
(guide §1.4) warm.  Writes a JSON report + per-query plan text.

Usage: python tools/audit_queries.py [sf_dir] [out_json]
"""
from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from logparse_spark.session import get_spark  # noqa: E402


def _session():
    # same confs as bench.py's default_bench (via bench_extra._session)
    return get_spark(
        app_name="audit-queries",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra={"spark.sql.files.maxPartitionBytes": "16m",
               "spark.task.cpus": "2"},
    )

RED_FLAGS = {
    "BatchEvalPython": "row-at-a-time Python UDF",
    "CartesianProduct": "cartesian product",
    "BroadcastNestedLoopJoin": "nested-loop join",
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH/audit_queries_r7.json"
    plans_dir = "plans/r07/audit"
    os.makedirs(plans_dir, exist_ok=True)
    spark = _session()
    report: dict[str, dict] = {}
    qs = entry.queries()
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"audit:{name}")
        rec: dict = {}
        try:
            df = fn(spark, sf)
            p = plan_text(df)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(p)
            flags = [msg for pat, msg in RED_FLAGS.items() if pat in p]
            rec["exchanges"] = p.count("Exchange")
            rec["reused"] = p.count("ReusedExchange")
            rec["arrow_eval"] = p.count("ArrowEvalPython")
            rec["map_in"] = p.count("MapInPandas") + p.count("MapInArrow")
            rec["bhj"] = p.count("BroadcastHashJoin")
            rec["smj"] = p.count("SortMergeJoin")
            rec["shj"] = p.count("ShuffledHashJoin")
            rec["pushed"] = bool(re.search(r"PushedFilters: \[[^\]]", p))
            rec["flags"] = flags
            # timed: warm twice, report both
            times = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            rec["noop_sec"] = times
        except Exception as e:  # pragma: no cover - audit tool
            rec["error"] = f"{type(e).__name__}: {e}"
        report[name] = rec
        print(f"{name}: {rec.get('noop_sec')} flags={rec.get('flags')}", flush=True)
    with open(out_json, "w") as fh:
        json.dump({"sf_dir": sf, "queries": report}, fh, indent=1, sort_keys=True)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
