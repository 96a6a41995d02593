"""P7 skew handling: measured hot-source detection on the zipf corpus
and salted repartition actually balancing partitions."""

from pyspark.sql import functions as F

from logparse_spark.operators.skew import hot_sources, salted_repartition
from logparse_spark.sources.datagen import generate_sequences


def test_hot_sources_detects_zipf_head(spark):
    seq = generate_sequences(spark, 4000, partitions=4)
    hot = hot_sources(seq, threshold_frac=0.05)
    assert "node-000" in hot            # zipf s=1.2 head holds ~15%
    assert len(hot) < 10                # the tail is not "hot"


def test_salted_repartition_balances(spark):
    seq = generate_sequences(spark, 4000, partitions=4)
    parts = salted_repartition(seq, 16, salt=8)
    sizes = [
        r["cnt"] for r in parts.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    ]
    assert len(sizes) == 16
    # without salting, node-000 (~600 rows) would pin one partition at
    # >= 600; salting spreads it: no partition may exceed 2x the mean
    mean = sum(sizes) / len(sizes)
    assert max(sizes) < 2 * mean, sizes


def test_salt_is_deterministic(spark):
    seq = generate_sequences(spark, 1000, partitions=2)
    a = salted_repartition(seq, 8, salt=4).withColumn("pid", F.spark_partition_id())
    b = salted_repartition(seq, 8, salt=4).withColumn("pid", F.spark_partition_id())
    pa_ = {r["doc_id"]: r["pid"] for r in a.select("doc_id", "pid").collect()}
    pb = {r["doc_id"]: r["pid"] for r in b.select("doc_id", "pid").collect()}
    assert pa_ == pb
