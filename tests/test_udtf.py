"""Python UDTF surface: lateral row expansion matches a hand-computed
expectation and the builtin-explode equivalent."""

from pyspark.sql import functions as F

from logparse_spark.functions.udtfs import SplitSentences, register_udtfs


def test_split_sentences_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "alpha beta. gamma. delta"), (2, "single"), (3, "")],
        "id int, text string",
    ).createOrReplaceTempView("t_udtf")
    rows = spark.sql("""
        SELECT id, s.idx, s.sentence
        FROM t_udtf, LATERAL split_sentences(text) s
        ORDER BY id, s.idx
    """).collect()
    got = [(r["id"], r["idx"], r["sentence"]) for r in rows]
    assert got == [
        (1, 0, "alpha beta"), (1, 1, "gamma"), (1, 2, "delta"),
        (2, 0, "single"),
        (3, 0, ""),
    ]


def test_udtf_agrees_with_builtin_explode(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(i, f"s{i}a. s{i}b. s{i}c") for i in range(50)], "id int, text string")
    df.createOrReplaceTempView("t_udtf2")
    via_udtf = {(r["id"], r["sentence"]) for r in spark.sql(
        "SELECT id, s.sentence FROM t_udtf2, LATERAL split_sentences(text) s").collect()}
    via_builtin = {(r["id"], r["sentence"]) for r in df.select(
        "id", F.explode(F.split("text", r"\. ")).alias("sentence")).collect()}
    assert via_udtf == via_builtin
