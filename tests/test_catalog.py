"""Catalog seam: parquet fallback works end-to-end; the Iceberg probe
answers honestly (no jars in this image)."""

from logparse_spark.sources.catalog import Catalog, iceberg_available
from logparse_spark.sources.datagen import generate_sequences


def test_probe_is_honest(spark):
    assert iceberg_available(spark) is False  # no Iceberg jars here


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = generate_sequences(spark, 300, partitions=2)
    cat.write(df, "seq", partition_by=["source"])
    back = cat.read("seq")
    assert back.count() == 300
    assert set(back.columns) == {"doc_id", "tokens", "n_tok", "source"}


def test_dynamic_partition_overwrite_is_partial(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = generate_sequences(spark, 300, partitions=2)
    cat.write(df, "seq", partition_by=["source"])
    one_source = df.where("source = 'node-000'")
    n0 = one_source.count()
    cat.write(one_source, "seq", partition_by=["source"])  # overwrite ONE partition
    assert cat.read("seq").count() == 300  # other partitions intact
    assert cat.read("seq").where("source = 'node-000'").count() == n0
