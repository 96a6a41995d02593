"""Physical-plan discipline tests: the properties that make the
pipeline survive a 100x scale-up, pinned as assertions."""

from pyspark.sql import functions as F

from logparse_spark.engine import parse_sequences
from logparse_spark.operators.enrich import enrich, rules_dim
from logparse_spark.plans import (
    assert_broadcast_join,
    assert_no_shuffle,
    assert_partial_aggregation,
    assert_pushed_filters,
    assert_wholestage_codegen,
)
from logparse_spark.sources.datagen import generate_sequences, nodes_dim

SF = "/root/testdata/sf0.001"


def test_enrich_is_broadcast_only(spark):
    parsed = parse_sequences(generate_sequences(spark, 100))
    out = enrich(parsed, nodes_dim(spark), rules_dim(spark))
    assert_broadcast_join(out, count=2)


def test_parse_stage_has_no_shuffle(spark):
    parsed = parse_sequences(generate_sequences(spark, 100))
    assert_no_shuffle(parsed)


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").where(F.col("l_quantity") > 49.0)
    assert_pushed_filters(df, "l_quantity")


def test_column_pruning(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_aggregate_codegen_and_partial_agg(spark):
    def build():
        return (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("cnt"))
        )

    assert_wholestage_codegen(build, spark)
    assert_partial_aggregation(build())
