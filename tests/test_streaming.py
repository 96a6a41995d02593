"""Streaming mode: the streamed parse must produce exactly the batch
result (same engine, same corpus), and watermarked windowed counts must
match a batch groupBy over the same windows."""

from pyspark.sql import functions as F

from logparse_spark.engine import parse_sequences
from logparse_spark.sources.datagen import generate_sequences
from logparse_spark.streaming.pipeline import (
    parse_stream,
    run_available_now,
    stateful_family_totals,
    stream_sequences,
    windowed_family_counts,
)

N = 1500


def test_streaming_route_equals_batch(spark, tmp_path):
    inp, sinks, ckpt = (str(tmp_path / d) for d in ("in", "sinks", "ckpt"))
    generate_sequences(spark, N, partitions=3).write.parquet(inp)

    run_available_now(spark, inp, sinks, ckpt)

    streamed = spark.read.parquet(sinks)
    batch = parse_sequences(spark.read.parquet(inp))
    assert streamed.count() == N
    s_hist = {(r["family"], r["rule_id"]): r["cnt"] for r in
              streamed.groupBy("family", "rule_id").agg(F.count("*").alias("cnt")).collect()}
    b_hist = {(r["family"], r["rule_id"]): r["cnt"] for r in
              batch.groupBy("family", "rule_id").agg(F.count("*").alias("cnt")).collect()}
    assert s_hist == b_hist


def test_streaming_windowed_counts(spark, tmp_path):
    inp = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ckpt2")
    generate_sequences(spark, N, partitions=3).write.parquet(inp)

    win = windowed_family_counts(parse_stream(stream_sequences(spark, inp)),
                                 window="1 hour", watermark="2 hours")
    # complete mode: emits all windows regardless of watermark progress
    # (append mode would emit only watermark-closed windows, and an
    # availableNow run over one micro-batch closes none)
    q = (
        win.writeStream.format("memory").queryName("win_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["start"], r["family"]): r["cnt"]
        for r in spark.sql("select * from win_counts").collect()
    }

    batch = parse_sequences(spark.read.parquet(inp))
    want = {
        (r["start"], r["family"]): r["cnt"]
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("win"), "family"
        ).agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("start"), "family", "cnt")
        .collect()
    }
    assert got == want


def test_stateful_totals_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: state must accumulate across micro-batches
    (maxFilesPerTrigger=1 forces several) and the final totals must equal
    the batch groupBy counts."""
    inp = str(tmp_path / "in3")
    ckpt = str(tmp_path / "ckpt3")
    generate_sequences(spark, N, partitions=4).write.parquet(inp)

    totals = stateful_family_totals(
        parse_stream(stream_sequences(spark, inp, max_files_per_trigger=1))
    )
    q = (
        totals.writeStream.format("memory").queryName("state_totals")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    emitted = spark.sql("select * from state_totals").collect()
    # multiple micro-batches actually happened for at least the hot source
    assert max(r["batches"] for r in emitted) > 1
    final = {}
    for r in emitted:  # last emission per key carries the running total
        k = (r["source"], r["family"])
        if k not in final or r["batches"] > final[k][1]:
            final[k] = (r["total"], r["batches"])
    want = {
        (r["source"], r["family"]): r["cnt"]
        for r in parse_sequences(spark.read.parquet(inp))
        .groupBy("source", "family").agg(F.count("*").alias("cnt")).collect()
    }
    assert {k: v[0] for k, v in final.items()} == want
