"""Edge cases at the pipeline surface: empty inputs, all-unknown
corpora, and single-row runs must complete, never crash, never drop."""

from logparse_spark.main import run_pipeline
from logparse_spark.operators.route import read_sink
from logparse_spark.sources.datagen import generate_sequences


def test_empty_input_pipeline(spark, tmp_path):
    empty = spark.createDataFrame([], "doc_id string, tokens array<int>, n_tok int, source string")
    m = run_pipeline(spark, empty, str(tmp_path / "e"), n_buckets=2, resume=False)
    assert m["routed_rows"] == 0


def test_all_unknown_corpus(spark, tmp_path):
    rows = [(f"u-{i}", list(f"garbage line {i}".encode()), len(f"garbage line {i}"), "node-000")
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")
    out = str(tmp_path / "u")
    m = run_pipeline(spark, df, out, n_buckets=2, resume=False)
    assert m["routed_rows"] == 50
    routed = read_sink(spark, f"{out}/sinks")
    assert routed.count() == 50
    assert {r["family"] for r in routed.select("family").distinct().collect()} == {"unknown"}


def test_single_row_pipeline(spark, tmp_path):
    df = generate_sequences(spark, 1, partitions=1)
    m = run_pipeline(spark, df, str(tmp_path / "s"), n_buckets=2, resume=False)
    assert m["routed_rows"] == 1
