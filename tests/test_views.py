"""Typed family views: map fields become correctly-typed columns with
values matching the oracle, NULL-sparse across rules of the family."""

from pyspark.sql import functions as F

from logparse_spark.engine import parse_sequences
from logparse_spark.operators.views import family_field_types, typed_view
from logparse_spark.sources.datagen import generate_sequences


def test_field_types_from_rulebook():
    t = family_field_types("gc")
    assert t["duration"] == "bigint"
    assert t["gc_type"] == "string"
    assert family_field_types("compaction")["rate"] == "double"


def test_gc_view_typed_values(spark):
    parsed = parse_sequences(generate_sequences(spark, 3000, partitions=4))
    gc = typed_view(parsed, "gc")
    rows = gc.select("doc_id", "rule_id", "duration", "collections", "used").collect()
    assert rows
    for r in rows:
        assert isinstance(r["duration"], int)
        assert r["duration"] == r["duration"]  # non-null for both gc rules
        if r["rule_id"] in (1, 939):  # 2.x and 1.2 GCInspector both capture `used`
            assert isinstance(r["used"], int)
        else:  # rule 2 has no `used` capture -> sparse NULL
            assert r["used"] is None
    # typed aggregation works directly
    stats = gc.agg(F.avg("duration").alias("avg_ms")).collect()[0]
    assert stats["avg_ms"] > 0


def test_compaction_view_rate_double(spark):
    parsed = parse_sequences(generate_sequences(spark, 3000, partitions=4))
    comp = typed_view(parsed, "compaction").where(F.col("rule_id") == 11)
    r = comp.select("rate", "input_bytes", "output_bytes").first()
    assert isinstance(r["rate"], float)
    assert isinstance(r["input_bytes"], int)
