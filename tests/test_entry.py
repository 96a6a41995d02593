"""Driver-contract test: entry() smoke + full DuckDB-oracle parity for
every queries()/oracle_sql() pair at sf0.001 (the driver repeats this
at sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.parity import TABLES, rowset, values_match

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    fams = {r["family"] for r in rows}
    assert "gc" in fams and "unknown" in fams


def test_every_oracle_has_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_parity(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(srows) > 0, f"{name}: rows-only query returned 0 rows"
        return
    rel = duck.sql(oracles[name])
    sc, sv = rowset([c.lower() for c in sdf.columns], srows)
    dc, dv = rowset([c.lower() for c in rel.columns], rel.fetchall())
    assert sc == dc, f"{name}: schema mismatch {sc} vs {dc}"
    assert len(sv) == len(dv), f"{name}: {len(sv)} vs {len(dv)} rows"
    assert values_match(sv, dv), f"{name}: values differ"
