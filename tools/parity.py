"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle, compare row
count, schema (sorted column names) and order-insensitive values.

Usage:  python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from logparse_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def values_match(a, b, rel=1e-9):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if va is None and vb is None:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if math.isclose(va, vb, rel_tol=rel, abs_tol=1e-9):
                    continue
                return False
            if va != vb:
                return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    spark = get_spark(app_name="parity", cores=8, shuffle_partitions=8)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL {name}: 0 rows on rows-only query")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        sc, sv = rowset([c.lower() for c in scols], [tuple(r) for r in srows])
        dc, dv = rowset(dcols, drows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: schema {sc} != {dc}")
        elif len(sv) != len(dv):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(sv)} != {len(dv)}")
        elif not values_match(sv, dv):
            failures.append(name)
            diff_shown = 0
            for ra, rb in zip(sv, dv):
                if not values_match([ra], [rb]):
                    print(f"  spark={ra}\n  duck ={rb}")
                    diff_shown += 1
                    if diff_shown >= 3:
                        break
            print(f"FAIL {name}: values differ ({len(sv)} rows)")
        else:
            print(f"PASS {name} ({len(sv)} rows)")
    spark.stop()
    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
