"""As-of join: both implementations must agree with each other and with
a hand-computed expectation, including ties and missing-right keys."""

from datetime import datetime

import pytest

from logparse_spark.operators.asof import asof_join_pandas, asof_join_union


def _t(m):
    return datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, _t(5), "L1"), (1, _t(10), "L2"), (2, _t(3), "L3"), (3, _t(9), "L4")],
        "k int, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _t(4), 40.0), (1, _t(10), 100.0), (1, _t(11), 110.0), (2, _t(7), 70.0)],
        "k int, ts timestamp, price double",
    )
    return left, right


EXPECT = {  # (k, left_ts_minute) -> asof price (<= semantics, latest prior)
    (1, 5): 40.0,
    (1, 10): 100.0,  # equal timestamp matches
    (2, 3): None,    # right exists later only
    (3, 9): None,    # no right key at all
}


def _check(rows):
    got = {(r["k"], r["ts"].minute): r["asof_price"] for r in rows}
    assert got == EXPECT, got


def test_asof_union(spark, sides):
    left, right = sides
    _check(asof_join_union(left, right, "k", "ts", "price").collect())


def test_asof_pandas(spark, sides):
    left, right = sides
    _check(asof_join_pandas(left, right, "k", "ts", "price").collect())


def test_asof_union_wide_left_payload_rides_as_one_struct(spark, sides):
    """A wide/heavy left schema (tokens!) must not appear as top-level
    window columns — the payload rides packed in one struct, so the
    window shuffle schema stays at 5 columns (VERDICT r2 #6)."""
    from pyspark.sql import functions as F

    left, right = sides
    wide = left.select(
        "*",
        F.array(F.lit(1), F.lit(2), F.lit(3)).alias("tokens"),
        F.lit("payload").alias("c1"),
        F.lit(2.5).alias("c2"),
    )
    out = asof_join_union(wide, right, "k", "ts", "price")
    assert out.columns == ["k", "ts", "name", "tokens", "c1", "c2", "asof_price"]
    rows = out.collect()
    got = {(r["k"], r["ts"].minute): r["asof_price"] for r in rows}
    assert got == EXPECT, got
    assert all(r["tokens"] == [1, 2, 3] and r["c1"] == "payload" for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window " in ln]
    assert win_lines, plan
    assert all("tokens#" not in ln for ln in win_lines), win_lines


def test_both_impls_agree_on_larger_data(spark):
    import random

    rnd = random.Random(7)
    left = spark.createDataFrame(
        [(rnd.randint(1, 5), _t(rnd.randint(0, 59)), f"L{i}") for i in range(200)],
        "k int, ts timestamp, name string",
    ).dropDuplicates(["k", "ts"])
    right = spark.createDataFrame(
        [(rnd.randint(1, 5), _t(rnd.randint(0, 59)), float(i)) for i in range(100)],
        "k int, ts timestamp, price double",
    ).dropDuplicates(["k", "ts"])
    a = {(r["k"], r["ts"]): r["asof_price"]
         for r in asof_join_union(left, right, "k", "ts", "price").collect()}
    b = {(r["k"], r["ts"]): r["asof_price"]
         for r in asof_join_pandas(left, right, "k", "ts", "price").collect()}
    assert a == b
