"""Reference CLI compatibility mode: stdin log text -> JSON event lines,
semantics identical to the engine (shared rulebook)."""

import io
import json
import subprocess
import sys

from logparse_spark.compat import main as compat_main

LOG = """\
INFO [ScheduledTasks:1] 2015-03-30 22:24:34,843 GCInspector.java (line 116) GC for ParNew: 241 ms for 1 collections, 4315386160 used; max is 8000634880
WARN [ReadStage:32] 2015-03-30 22:24:35,104 CassandraDaemon.java:142 - Exception in thread Thread[ReadStage:32,5,main]
java.lang.AssertionError: boom
\tat org.x.Y.z(Y.java:1)
INFO [main] 2015-03-30 22:24:36,000 NovelClass.java (line 1) nothing matches this
"""


def _parse_lines(text):
    buf_in, buf_out = io.StringIO(text), io.StringIO()
    assert compat_main(buf_in, buf_out) == 0
    return [json.loads(line) for line in buf_out.getvalue().splitlines()]


def test_compat_stream_events():
    evs = _parse_lines(LOG)
    assert len(evs) == 3
    gc, exc, unk = evs
    assert gc["rule_id"] == 1 and gc["family"] == "gc"
    assert gc["duration"] == "241" and gc["event_category"] == "garbage_collection"
    assert gc["ts"] == "2015-03-30 22:24:34.843000"
    assert exc["rule_id"] == 63 and exc["extra"] == [
        "java.lang.AssertionError: boom", "\tat org.x.Y.z(Y.java:1)"]
    assert unk["rule_id"] == -1 and unk["family"] == "unknown"
    assert unk["message"] == "nothing matches this"  # never dropped


def test_compat_cli_pipe():
    """The actual reference invocation shape: pipe a log through the module."""
    out = subprocess.run(
        [sys.executable, "-m", "logparse_spark.compat", "node-007"],
        input=LOG, capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    evs = [json.loads(line) for line in out.stdout.splitlines()]
    assert len(evs) == 3
    assert all(e["source"] == "node-007" for e in evs)
