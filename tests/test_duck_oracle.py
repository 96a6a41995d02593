"""The generated DuckDB SQL parse replica (logparse_spark.duck_oracle)
must agree with the pure-Python oracle on EVERY rulebook fixture line —
this is what makes the q_pipeline_* driver oracles trustworthy, and it
catches any Python-re construct RE2 can't replicate the moment a rule
is added."""

import duckdb
import pytest

from logparse_spark.duck_oracle import (
    HEADER_SQL_REGEX,
    family_case_sql,
    materialize_corpus,
    rule_case_sql,
)
from logparse_spark.oracle import parse_text
from tests.test_rules import FIXTURE_LINES, HDR20, HDR21


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET threads = 2")
    return con


def test_sql_rule_match_equals_python_oracle_on_all_fixtures(duck):
    rows = []
    for i, (cls, msg, rule_id, family, _want) in enumerate(FIXTURE_LINES):
        for hdr in (HDR20, HDR21):
            text = hdr.format(thread=f"T:{i}", cls=cls, msg=msg)
            ev = parse_text(text)  # ground truth (== engine, test_rules)
            rows.append((text, ev["rule_id"], ev["family"]))
    duck.execute("CREATE OR REPLACE TABLE fx(text VARCHAR, want_rid INT, want_fam VARCHAR)")
    duck.executemany("INSERT INTO fx VALUES (?, ?, ?)", rows)
    hdr = HEADER_SQL_REGEX.replace("'", "''")
    got = duck.execute(f"""
        WITH hdr AS (
            SELECT text, want_rid, want_fam,
                   regexp_matches(text, '{hdr}') AS hdr_ok,
                   regexp_extract(text, '{hdr}', 2) AS cls,
                   regexp_extract(text, '{hdr}', 3) AS msg
            FROM fx
        )
        SELECT text, want_rid, want_fam, rid, {family_case_sql("rid")} AS fam
        FROM (
            SELECT *, CASE WHEN hdr_ok THEN {rule_case_sql("msg", "cls")}
                           ELSE -1 END AS rid
            FROM hdr
        )
    """).fetchall()
    bad = [(t[:90], w, f, r, fm) for t, w, f, r, fm in got if (w, f) != (r, fm)]
    assert not bad, bad[:10]


def test_materialized_corpus_matches_python_oracle(duck):
    """Spot-check the corpus parquet + header SQL against oracle.py on a
    sample (the full 5000-row histogram equality is the driver query)."""
    path = materialize_corpus(500, 42)
    hdr = HEADER_SQL_REGEX.replace("'", "''")
    got = duck.execute(f"""
        SELECT doc_id, text,
               CASE WHEN regexp_matches(split_part(text, chr(10), 1), '{hdr}')
                    THEN {rule_case_sql("regexp_extract(split_part(text, chr(10), 1), '" + hdr + "', 3)",
                                        "regexp_extract(split_part(text, chr(10), 1), '" + hdr + "', 2)")}
                    ELSE -1 END AS rid
        FROM read_parquet('{path}')
    """).fetchall()
    assert len(got) == 500
    for doc_id, text, rid in got:
        assert parse_text(text)["rule_id"] == rid, (doc_id, text[:90], rid)
