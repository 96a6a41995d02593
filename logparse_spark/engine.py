"""The vectorized rule engine (P3): ONE ``mapInPandas`` stage doing
detokenize -> header parse -> class dispatch -> ordered first-match
regex extraction -> convert -> promote.

This is the reference's entire runtime (systemlog.py §parse_log +
§capture_line + §capture_message, rules.py combinators [R-H]) collapsed
into a single Arrow-batched stage:

- NO per-row Python UDFs (BASELINE.json mandate): all extraction is
  pandas ``Series.str.extract`` over class-masked subsets;
- first-match-wins preserved by ordered iteration + mask update
  (rules.py §capture/§switch semantics);
- `switch`-on-emitting-class dispatch == pruning which rules run per
  row (each rule's regex only ever runs on its class's rows);
- `tokens` passes through bit-identically (the binding per-row
  invariant).

Scale: the stage is embarrassingly parallel (no shuffle), state-free,
and streams bounded Arrow batches (spark.sql.execution.arrow.
maxRecordsPerBatch), so it scales linearly with executors; the only
JVM<->Python boundary in the whole pipeline is here, crossed once.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from logparse_spark.rulebook import (
    CONVERTERS,
    DATE_FORMAT,
    PROMOTED_COLUMNS,
    UNKNOWN_FAMILY,
    UNKNOWN_RULE_ID,
    compile_rulebook,
)
from logparse_spark.tokenizer import detokenize_series

PARSED_SCHEMA = (
    "doc_id string, source string, tokens array<int>, n_tok int, "
    "level string, thread_name string, thread_id string, ts timestamp, "
    "source_file string, source_line int, message string, extra array<string>, "
    "rule_id int, family string, fields map<string,string>, "
    + ", ".join(f"{c} {'bigint' if t == 'long' else t}" for c, t in PROMOTED_COLUMNS)
)

_PATTERN_CACHE: dict[tuple[str, int], re.Pattern] = {}


def _pat(regex: str, flags: int = 0) -> re.Pattern:
    key = (regex, flags)
    p = _PATTERN_CACHE.get(key)
    if p is None:
        p = _PATTERN_CACHE[key] = re.compile(regex, flags)
    return p


def _convert_columns(ext: pd.DataFrame, converters: dict[str, str]) -> pd.DataFrame:
    """Vectorized canonical conversion (rules.py §convert [R-H])."""
    for fname, conv in converters.items():
        col = ext[fname]
        if conv == "int":
            ext[fname] = col.astype("int64").astype(str)
        elif conv == "comma_int":
            ext[fname] = col.str.replace(",", "", regex=False).astype("int64").astype(str)
        elif conv == "float":
            ext[fname] = col.astype("float64").map(lambda v: str(v))
        else:  # pragma: no cover - unknown converter kept as-is
            ext[fname] = col
    return ext


def parse_batch(pdf: pd.DataFrame, compiled: dict) -> pd.DataFrame:
    """Parse one Arrow batch of `sequences` rows into structured events."""
    n = len(pdf)
    idx = pd.RangeIndex(n)
    text = detokenize_series(pdf["tokens"].reset_index(drop=True))

    # --- header parse (capture_line [R-H]): ordered format alternatives ----
    hdr_cols = ["level", "thread", "date", "source_file", "source_line", "message"]
    hdr = pd.DataFrame(index=idx, columns=hdr_cols, dtype=object)
    unmatched = np.ones(n, dtype=bool)
    for hregex in compiled["headers"]:
        if not unmatched.any():
            break
        sub_idx = np.flatnonzero(unmatched)
        ext = text.iloc[sub_idx].str.extract(_pat(hregex, re.DOTALL))
        hit = ext["level"].notna().to_numpy()
        if hit.any():
            hit_idx = sub_idx[hit]
            hdr.iloc[hit_idx] = ext.loc[hit, hdr_cols].to_numpy()
            unmatched[hit_idx] = False
    header_ok = ~unmatched

    # message first-line vs continuation (parse_log fold [R-H]: one row ==
    # one pre-folded event; continuation lines go to `extra`)
    msg_full = hdr["message"].where(header_ok, text)
    split = msg_full.str.split("\n", n=1, expand=True)
    message = split[0]
    extra_str = split[1] if split.shape[1] > 1 else pd.Series([None] * n, index=idx)
    extra = extra_str.map(lambda s: s.split("\n") if isinstance(s, str) else None)

    thr = hdr["thread"].str.extract(_pat(r"^(?P<thread_name>.*?)(?::(?P<thread_id>\d+))?$"))
    ts = pd.to_datetime(hdr["date"], format=DATE_FORMAT, errors="coerce")
    class_stem = hdr["source_file"].str.replace(".java", "", regex=False)

    # --- rule dispatch + ordered first-match extraction ---------------------
    rule_id = np.full(n, UNKNOWN_RULE_ID, dtype=np.int32)
    family = np.full(n, UNKNOWN_FAMILY, dtype=object)
    fields: list[dict | None] = [{} for _ in range(n)]
    promoted = {c: np.full(n, None, dtype=object) for c, _ in PROMOTED_COLUMNS}

    cls_values = class_stem.to_numpy(dtype=object)
    for cls, rules in compiled["by_class"].items():
        remaining = (cls_values == cls) & header_ok
        if not remaining.any():
            continue
        for rule in rules:
            sub_idx = np.flatnonzero(remaining)
            if sub_idx.size == 0:
                break
            sub = message.iloc[sub_idx]
            if rule["groups"]:
                ext = sub.str.extract(_pat(rule["regex"]))
                hit = ext.notna().all(axis=1).to_numpy()
            else:
                hit = sub.str.match(_pat(rule["regex"])).to_numpy()
                ext = None
            if not hit.any():
                continue
            hit_idx = sub_idx[hit]
            rule_id[hit_idx] = rule["rule_id"]
            family[hit_idx] = rule["family"]
            if ext is not None:
                matched = _convert_columns(ext.loc[hit].copy(), rule["converters"])
                for fname, col in rule["promote"].items():
                    vals = matched[fname]
                    nums = pd.to_numeric(vals, errors="coerce")
                    promoted[col][hit_idx] = [
                        int(v) if pd.notna(v) else None for v in nums
                    ]
                recs = matched.to_dict("records")
                for i, rec in zip(hit_idx, recs):
                    fields[i] = {k: v for k, v in rec.items() if isinstance(v, str)}
            remaining[hit_idx] = False

    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].reset_index(drop=True),
            "source": pdf["source"].reset_index(drop=True),
            "tokens": pdf["tokens"].reset_index(drop=True),
            "n_tok": pdf["n_tok"].reset_index(drop=True),
            "level": hdr["level"],
            "thread_name": thr["thread_name"],
            "thread_id": thr["thread_id"],
            "ts": ts,
            "source_file": hdr["source_file"],
            "source_line": pd.to_numeric(hdr["source_line"], errors="coerce").astype("Int32"),
            "message": message,
            "extra": extra,
            "rule_id": rule_id,
            "family": family,
            "fields": pd.Series(fields, index=idx),
        }
    )
    for c, _ in PROMOTED_COLUMNS:
        out[c] = pd.Series(promoted[c], index=idx, dtype=object)
    return out


def parse_sequences(df: DataFrame, rules=None) -> DataFrame:
    """sequences(doc_id, tokens, n_tok, source) -> parsed events DataFrame.

    The compiled rule table travels in the task closure (it is tiny); at
    a few hundred rules it would move to ``sparkContext.broadcast``.
    """
    compiled = compile_rulebook(rules)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield parse_batch(pdf, compiled)

    return df.mapInPandas(fn, schema=PARSED_SCHEMA)
