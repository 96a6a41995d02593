"""Property tests (SURVEY.md §5.2 item 7): arbitrary byte sequences and
near-miss mutations of valid lines must never crash the oracle or the
engine, never drop a row, and mutated-beyond-match lines must route to
`unknown` — the reference's never-drop contract under fuzz.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from logparse_spark.oracle import parse_event, parse_text
from logparse_spark.rulebook import UNKNOWN_FAMILY, UNKNOWN_RULE_ID
from logparse_spark.sources.datagen import make_event
from logparse_spark.tokenizer import decode, encode


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_oracle_never_crashes_on_bytes(payload):
    ev = parse_event("fuzz", list(payload), "node-000")
    assert ev["tokens"] == list(payload)  # passthrough even for garbage
    assert ev["family"] is not None
    assert ev["rule_id"] is not None


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_oracle_never_crashes_on_text(text):
    ev = parse_text(text)
    assert ev["message"] is not None
    assert (ev["rule_id"] == UNKNOWN_RULE_ID) == (ev["family"] == UNKNOWN_FAMILY)


@given(st.integers(min_value=0, max_value=10**6), st.integers(min_value=0, max_value=250))
@settings(max_examples=200, deadline=None)
def test_mutated_line_never_drops(rid, cut):
    """Truncate a valid line at an arbitrary byte: parse must still yield
    exactly one event (possibly unknown), tokens preserved."""
    _, tokens, _, source = make_event(rid)
    mutated = tokens[: max(1, min(cut, len(tokens)))]
    ev = parse_event("m", mutated, source)
    assert ev["tokens"] == [int(t) for t in mutated]
    assert ev["n_tok"] == len(mutated)


@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=200, deadline=None)
def test_generated_lines_roundtrip(rid):
    """Every generated line is tokenizer-roundtrip-stable and parses to a
    non-crashing event whose family is consistent with rule_id."""
    doc_id, tokens, n_tok, source = make_event(rid)
    text = decode(tokens)
    assert encode(text) == tokens  # ASCII corpus: exact roundtrip
    ev = parse_event(doc_id, tokens, source)
    assert ev["n_tok"] == n_tok
    if ev["rule_id"] != UNKNOWN_RULE_ID:
        assert ev["family"] != UNKNOWN_FAMILY
        assert ev["level"] in ("INFO", "WARN", "ERROR")
