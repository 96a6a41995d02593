"""Text-analysis operators: language ID on known-language samples,
quality monotonicity, token counts, fingerprint invariance."""

from pyspark.sql import functions as F

from logparse_spark.operators import text as tx


def test_lang_id(spark):
    rows = [
        ("e", "the cat and the dog sat on the mat in the house"),
        ("s", "el perro y el gato en la casa de los vecinos"),
        ("f", "le chat et le chien dans la maison des voisins"),
        ("g", "der hund und die katze mit den nachbarn ist nicht da"),
        ("u", "zzz qqq xxx yyy www"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r["lang"] for r in
           df.select("id", tx.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {"e": "en", "s": "es", "f": "fr", "g": "de", "u": "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([("a", "Hello world, 42 tokens here!")], "id string, text string")
    r = df.select(
        tx.whitespace_token_count(F.col("text")).alias("ws"),
        tx.bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r["ws"] == 5
    # Hello|world|,|42|tokens|here|! -> 7 BPE-ish pieces
    assert r["bpe"] == 7


def test_quality_score_monotone(spark):
    rows = [("good", "the cat and the dog sat on the mat in the fine house today ok"),
            ("bad", "!!! ??? ### $$$")]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r["quality"] for r in tx.quality_score(df).select("id", "quality").collect()}
    assert got["good"] > got["bad"]


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [("a", "Hello   world"), ("b", "hello world"), ("c", "hello worlds")],
        "id string, text string")
    got = {r["id"]: r["fp"] for r in
           df.select("id", tx.fingerprint(F.col("text")).alias("fp")).collect()}
    assert got["a"] == got["b"]
    assert got["a"] != got["c"]


def test_shingle_fingerprint_local_edit_stability(spark):
    base = "abcdefghijklmnopqrstuvwxyz" * 4
    df = spark.createDataFrame(
        [("a", base), ("b", base + "!"), ("c", "completely different")],
        "id string, text string")
    got = {r["id"]: r["fp"] for r in
           df.select("id", tx.shingle_fingerprint(F.col("text")).alias("fp")).collect()}
    assert got["a"] == got["b"]  # min-shingle unchanged by a suffix edit
    assert got["a"] != got["c"]
