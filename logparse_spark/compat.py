"""Reference CLI compatibility: ``python -m logparse_spark.compat <
system.log`` emits one JSON object per parsed event on stdout — the
drop-in twin of the reference's ``python systemlog.py < system.log``
stream mode (systemlog.py §__main__ [R-M]).

Single-process and Spark-free on purpose: the reference is a one-pass
generator over stdin, and this mode keeps that exact operational shape
(pipe-able, line-buffered, no JVM start-up) while sharing EVERY
semantic with the distributed engine — the header formats, rule table,
converters and unknown fallback all come from rulebook.py via
oracle.parse_text, which tests pin equal to the Spark path.  For bulk
corpora use ``python -m logparse_spark.main --raw-logs`` instead.

Event JSON shape (sparse, like the reference's dict): header fields +
``rule_id``/``family``/taxonomy + captured ``fields`` flattened in,
``extra`` continuation lines when present; ``ts`` ISO-formatted.
"""

from __future__ import annotations

import json
import sys

from logparse_spark.oracle import parse_text
from logparse_spark.rulebook import rules_dim_rows
from logparse_spark.sources.rawlog import iter_fold

_TAXONOMY = {
    row[0]: {"event_product": row[5], "event_category": row[6], "event_type": row[7]}
    for row in rules_dim_rows()
}

# Header/taxonomy keys a flattened capture group must never overwrite
# (a rule capturing e.g. `level` would silently replace the log level);
# rulebook capture-group names are tested against this set.
RESERVED_EVENT_KEYS = frozenset({
    "level", "thread_name", "thread_id", "ts", "source_file", "source_line",
    "message", "rule_id", "family", "event_product", "event_category",
    "event_type", "source", "extra",
})


def event_json(text: str, source: str | None = None) -> str:
    ev = parse_text(text)
    out = {
        "level": ev["level"],
        "thread_name": ev["thread_name"],
        "thread_id": ev["thread_id"],
        "ts": ev["ts"].isoformat(sep=" ") if ev["ts"] else None,
        "source_file": ev["source_file"],
        "source_line": ev["source_line"],
        "message": ev["message"],
        "rule_id": ev["rule_id"],
        "family": ev["family"],
        **_TAXONOMY[ev["rule_id"]],
        **{k: v for k, v in ev["fields"].items() if k not in RESERVED_EVENT_KEYS},
    }
    if source is not None:
        out["source"] = source
    if ev.get("extra"):
        out["extra"] = ev["extra"]
    return json.dumps({k: v for k, v in out.items() if v is not None})


def main(stdin=None, stdout=None, source: str | None = None) -> int:
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    # incremental fold: events emit as soon as the next header arrives,
    # so a live `tail -f | compat` pipe streams with O(1 event) memory
    for event_text in iter_fold(stdin):
        stdout.write(event_json(event_text, source) + "\n")
    return 0


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else None
    raise SystemExit(main(source=src))
