"""r7 parse-kernel rewrite pin: the direct `re`-loop extraction must be
semantically identical to the pandas ``str.extract`` machinery it
replaced — including the subtle hit rules:

- header hit  == extract + ``level`` notna (optional groups may be None)
- rule hit    == extract + ``notna().all(axis=1)`` (a regex MATCH with an
  unmatched optional group is NOT a hit and must fall through to later
  rules / unknown)
- no-group rules use ``str.match`` (anchored-at-start) semantics, not
  search.

(The full-rulebook equivalence is carried by test_rules.py's 1:1
fixtures and the DuckDB SQL replica; this file pins the edge shapes
directly.)
"""

import re

import numpy as np
import pandas as pd

from logparse_spark.engine import parse_texts
from logparse_spark.rulebook import compile_rulebook


def _reference_rule_pass(messages: list[str], regex: str) -> list[bool]:
    """The pandas semantics the kernel must reproduce for group rules."""
    ext = pd.Series(messages, dtype=object).str.extract(re.compile(regex))
    return ext.notna().all(axis=1).tolist()


def test_optional_group_match_is_not_a_hit():
    # a regex that MATCHES but leaves an optional named group unmatched
    # must not count as a hit (pandas notna().all(axis=1) contract)
    regex = r"event (?P<kind>\w+)(?: id=(?P<id>\d+))?"
    msgs = ["event start id=7", "event start", "no event here"]
    ref = _reference_rule_pass(msgs, regex)
    assert ref == [True, False, False]

    # kernel path: hit iff search matches AND no group is None
    pat = re.compile(regex)
    got = []
    for m in msgs:
        mo = pat.search(m)
        got.append(mo is not None and None not in mo.groups())
    assert got == ref


def test_no_group_rule_uses_match_not_search():
    # str.match anchors at the start; search does not — the kernel must
    # keep match semantics for group-less rules
    s = pd.Series(["INFO starting", "prefix INFO starting"], dtype=object)
    ref = s.str.match(re.compile(r"INFO")).tolist()
    pat = re.compile(r"INFO")
    got = [pat.match(x) is not None for x in s]
    assert got == ref == [True, False]


def test_parse_texts_smoke_on_real_rulebook_lines():
    """End-to-end kernel sanity on representative header + body shapes,
    including an unmatched header and a continuation line."""
    compiled = compile_rulebook()
    lines = [
        "INFO  [main] 2024-03-01 10:00:00,123 StorageService.java:123 - "
        "Starting up server",
        "garbage line with no header",
        "WARN  [ReadStage-2:7] 2024-03-01 10:00:01,000 NoSpamLogger.java:94 - "
        "Out of 1 commit log syncs\ncontinuation detail line",
    ]
    texts = pd.Series(lines, dtype=object)
    cols = parse_texts(texts, compiled)
    assert cols["level"][0] == "INFO"
    assert cols["level"][1] is None          # header missed -> unknown path
    assert cols["rule_id"][1] == -1
    assert cols["message"][2].startswith("Out of")
    assert cols["extra"][2] == ["continuation detail line"]
    assert cols["thread_id"][2] == "7"
