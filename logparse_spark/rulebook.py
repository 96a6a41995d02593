"""The rule table: riptano/logparse's ``capture_message`` recast as DATA.

Reference parity (reconstructed — /root/reference was empty; see
SURVEY.md §0/§2.1 [R-H] and FIXTURES.md §2):

- ``rules.py §rule/§capture/§convert/§update/§case/§switch`` combinators
  collapse into one declarative :class:`Rule` row: ordered regexes with
  named groups (capture), per-field converters (convert), taxonomy
  constants (update), an emitting-class dispatch key (case/switch).
- ``systemlog.py §capture_line`` becomes the two HEADER_FORMATS below
  (Cassandra 1.2/2.0 ``Source.java (line N)`` vs 2.1+ ``Source.java:N -``).
- ``systemlog.py §capture_message`` becomes RULES, ordered
  first-match-wins within each class.

At runtime the compiled table is broadcast and interpreted *vectorized*
(pandas ``Series.str.extract`` over class-masked subsets) inside one
``mapInPandas`` stage — see engine.py.  This module stays pure-Python /
picklable: no Spark imports.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Header formats (systemlog.py §capture_line [R-H]).
# Message group is DOTALL: continuation lines (stack traces) arrive already
# folded into the sequence (one row == one event, BASELINE.json input_hint);
# engine splits first line (rule-match target) from `extra`.
# ---------------------------------------------------------------------------
HEADER_FORMATS: list[str] = [
    # Cassandra 1.2 / 2.0: "LEVEL [thread] date Source.java (line N) msg"
    r"^(?P<level>[A-Z]+)\s+\[(?P<thread>[^\]]+)\]\s+"
    r"(?P<date>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})\s+"
    r"(?P<source_file>\w+\.java) \(line (?P<source_line>\d+)\) (?P<message>.*)$",
    # Cassandra 2.1+: "LEVEL [thread] date Source.java:N - msg"
    r"^(?P<level>[A-Z]+)\s+\[(?P<thread>[^\]]+)\]\s+"
    r"(?P<date>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})\s+"
    r"(?P<source_file>\w+\.java):(?P<source_line>\d+) - (?P<message>.*)$",
]
DATE_FORMAT = "%Y-%m-%d %H:%M:%S,%f"  # systemlog.py date converter [R-H]

UNKNOWN_RULE_ID = -1
UNKNOWN_FAMILY = "unknown"


# ---------------------------------------------------------------------------
# Converters (rules.py §convert + systemlog.py converters [R-H]).
# Canonical string forms keep the map<string,string> `fields` column
# comparable between the Spark path and the oracle.
# ---------------------------------------------------------------------------
def _canon_int(s: str) -> str:
    return str(int(s))


def _canon_comma_int(s: str) -> str:
    # reference strips thousands separators: '60,016,741' -> 60016741
    return str(int(s.replace(",", "")))


def _canon_float(s: str) -> str:
    return str(float(s))


CONVERTERS = {
    "int": _canon_int,
    "comma_int": _canon_comma_int,
    "float": _canon_float,
}


@dataclass(frozen=True)
class Rule:
    """One row of the ordered rule table (one reference `rule(...)` entry)."""

    rule_id: int
    source_class: str  # dispatch key: emitting Java class (case/switch)
    family: str  # routing key (P5 fan-out)
    regex: str  # named-group capture (rules.py §capture)
    converters: dict[str, str] = field(default_factory=dict)  # field -> conv name
    promote: dict[str, str] = field(default_factory=dict)  # field -> typed column
    event_product: str = "cassandra"
    event_category: str = ""
    event_type: str = ""


# ---------------------------------------------------------------------------
# THE rule table (systemlog.py §capture_message [R-H]; fixture corpus
# FIXTURES.md §2).  Order within a class == priority (first match wins).
# ---------------------------------------------------------------------------
RULES: list[Rule] = [
    # --- GCInspector -------------------------------------------------------
    Rule(
        1, "GCInspector", "gc",
        r"^GC for (?P<gc_type>\w+): (?P<duration>\d+) ms for (?P<collections>\d+) "
        r"collections, (?P<used>\d+) used; max is (?P<max>\d+)$",
        converters={"duration": "int", "collections": "int", "used": "int", "max": "int"},
        promote={"duration": "duration_ms", "used": "bytes_in"},
        event_category="garbage_collection", event_type="pause",
    ),
    Rule(
        2, "GCInspector", "gc",
        r"^(?P<gc_type>\w+) GC in (?P<duration>\d+)ms\.\s+CMS Old Gen: "
        r"(?P<old_before>\d+) -> (?P<old_after>\d+); Par Eden Space: "
        r"(?P<eden_before>\d+) -> (?P<eden_after>\d+)$",
        converters={
            "duration": "int", "old_before": "int", "old_after": "int",
            "eden_before": "int", "eden_after": "int",
        },
        promote={"duration": "duration_ms"},
        event_category="garbage_collection", event_type="pause",
    ),
    # --- CompactionTask ----------------------------------------------------
    Rule(
        10, "CompactionTask", "compaction",
        r"^Compacting \[(?P<input_sstables>SSTableReader\(.*)\]$",
        event_category="compaction", event_type="begin",
    ),
    Rule(
        11, "CompactionTask", "compaction",
        r"^Compacted (?P<sstable_count>\d+) sstables to \[(?P<output_sstable>[^\]]*)\]\.\s+"
        r"(?P<input_bytes>[\d,]+) bytes to (?P<output_bytes>[\d,]+) "
        r"\(~(?P<percent_of_original>\d+)% of original\) in (?P<duration>[\d,]+)ms = "
        r"(?P<rate>[\d.]+)MB/s\.\s+(?P<total_partitions>[\d,]+) total partitions merged "
        r"to (?P<partitions_merged>[\d,]+)\.\s+Partition merge counts were "
        r"\{(?P<merge_counts>[^}]*)\}$",
        converters={
            "sstable_count": "int", "input_bytes": "comma_int",
            "output_bytes": "comma_int", "percent_of_original": "int",
            "duration": "comma_int", "rate": "float",
            "total_partitions": "comma_int", "partitions_merged": "comma_int",
        },
        promote={"duration": "duration_ms", "input_bytes": "bytes_in",
                 "output_bytes": "bytes_out"},
        event_category="compaction", event_type="end",
    ),
    # --- flush path --------------------------------------------------------
    Rule(
        20, "ColumnFamilyStore", "flush",
        r"^Enqueuing flush of Memtable-(?P<table>[^@]+)@(?P<hash>\d+)\("
        r"(?P<serialized_bytes>\d+)/(?P<live_bytes>\d+) serialized/live bytes, "
        r"(?P<ops>\d+) ops\)$",
        converters={"hash": "int", "serialized_bytes": "int",
                    "live_bytes": "int", "ops": "int"},
        promote={"serialized_bytes": "bytes_in"},
        event_category="flush", event_type="enqueue",
    ),
    Rule(
        21, "Memtable", "flush",
        r"^Writing Memtable-(?P<table>[^@]+)@(?P<hash>\d+)\("
        r"(?P<serialized_bytes>\d+)/(?P<live_bytes>\d+) serialized/live bytes, "
        r"(?P<ops>\d+) ops\)$",
        converters={"hash": "int", "serialized_bytes": "int",
                    "live_bytes": "int", "ops": "int"},
        promote={"serialized_bytes": "bytes_in"},
        event_category="flush", event_type="begin",
    ),
    Rule(
        22, "Memtable", "flush",
        r"^Completed flushing (?P<filename>\S+) \((?P<file_size>\d+) bytes\) for "
        r"commitlog position ReplayPosition\(segmentId=(?P<segment_id>\d+), "
        r"position=(?P<position>\d+)\)$",
        converters={"file_size": "int", "segment_id": "int", "position": "int"},
        promote={"file_size": "bytes_out"},
        event_category="flush", event_type="end",
    ),
    # --- dropped messages --------------------------------------------------
    Rule(
        30, "MessagingService", "drops",
        r"^(?P<count>\d+) (?P<message_type>\w+) messages dropped in last "
        r"(?P<window_ms>\d+)ms$",
        converters={"count": "int", "window_ms": "int"},
        promote={"count": "count"},
        event_category="messaging", event_type="drops",
    ),
    # --- gossip ------------------------------------------------------------
    Rule(
        40, "Gossiper", "gossip",
        r"^InetAddress /(?P<endpoint>[\d.]+) is now (?P<status>UP|DOWN)$",
        event_category="gossip", event_type="node_status",
    ),
    Rule(
        41, "Gossiper", "gossip",
        r"^FatClient /(?P<endpoint>[\d.]+) has been silent for (?P<silent_ms>\d+)ms, "
        r"removing from gossip$",
        converters={"silent_ms": "int"},
        promote={"silent_ms": "duration_ms"},
        event_category="gossip", event_type="fat_client_removed",
    ),
    # --- StatusLogger pool stats -------------------------------------------
    Rule(
        50, "StatusLogger", "status",
        r"^(?P<pool_name>[A-Za-z_]+)\s{2,}(?P<active>\d+)\s+(?P<pending>\d+)\s+"
        r"(?P<completed>\d+)\s+(?P<blocked>\d+)\s+(?P<all_time_blocked>\d+)$",
        converters={"active": "int", "pending": "int", "completed": "int",
                    "blocked": "int", "all_time_blocked": "int"},
        event_category="status", event_type="threadpool",
    ),
    # --- startup -----------------------------------------------------------
    Rule(
        60, "StorageService", "startup",
        r"^Cassandra version: (?P<version>[\d.]+)$",
        event_category="startup", event_type="version",
    ),
    Rule(
        61, "CassandraDaemon", "startup",
        r"^Heap size: (?P<heap_used>\d+)/(?P<heap_max>\d+)$",
        converters={"heap_used": "int", "heap_max": "int"},
        promote={"heap_used": "bytes_in"},
        event_category="startup", event_type="heap",
    ),
    Rule(
        62, "CassandraDaemon", "startup",
        r"^Logging initialized$",
        event_category="startup", event_type="logging",
    ),
    # --- exception (continuation lines land in `extra`) ---------------------
    Rule(
        63, "CassandraDaemon", "exception",
        r"^Exception in thread Thread\[(?P<exception_thread>[^,\]]+),"
        r"(?P<priority>\d+),main\]$",
        converters={"priority": "int"},
        event_category="error", event_type="exception",
    ),
    # --- network -----------------------------------------------------------
    Rule(
        70, "OutboundTcpConnection", "network",
        r"^Handshaking version with /(?P<endpoint>[\d.]+)$",
        event_category="network", event_type="handshake",
    ),
    # --- hints -------------------------------------------------------------
    Rule(
        80, "HintedHandOffManager", "hints",
        r"^Finished hinted handoff of (?P<rows>\d+) rows to endpoint "
        r"/(?P<endpoint>[\d.]+)$",
        converters={"rows": "int"},
        promote={"rows": "count"},
        event_category="hints", event_type="handoff_end",
    ),
    # --- sstable / commitlog / cache / cql / batch --------------------------
    Rule(
        90, "SSTableReader", "sstable",
        r"^Opening (?P<filename>\S+) \((?P<bytes>\d+) bytes\)$",
        converters={"bytes": "int"},
        promote={"bytes": "bytes_in"},
        event_category="sstable", event_type="open",
    ),
    Rule(
        100, "CommitLogReplayer", "commitlog",
        r"^Replaying (?P<filename>\S+)$",
        event_category="commitlog", event_type="replay",
    ),
    Rule(
        110, "AutoSavingCache", "cache",
        r"^Saved (?P<cache_type>\w+) \((?P<items>\d+) items\) in "
        r"(?P<duration>\d+) ms$",
        converters={"items": "int", "duration": "int"},
        promote={"duration": "duration_ms", "items": "count"},
        event_category="cache", event_type="save",
    ),
    Rule(
        120, "Server", "cql",
        r"^Starting listening for CQL clients on /(?P<addr>[\d.]+):(?P<port>\d+)\.\.\.$",
        converters={"port": "int"},
        event_category="cql", event_type="listen",
    ),
    Rule(
        130, "BatchStatement", "batch",
        r"^Batch of prepared statements for \[(?P<keyspace_table>[^\]]+)\] is of "
        r"size (?P<size>\d+), exceeding specified threshold of (?P<threshold>\d+) "
        r"by (?P<exceed>\d+)\.$",
        converters={"size": "int", "threshold": "int", "exceed": "int"},
        promote={"size": "bytes_in"},
        event_category="batch", event_type="size_warning",
    ),
    # --- breadth rules (reference classes beyond the fixture corpus;
    # systemlog.py §capture_message [R-M], unit-tested via literal lines) ---
    Rule(
        140, "StorageService", "startup",
        r"^JOINING: (?P<joining_status>.*)$",
        event_category="startup", event_type="joining",
    ),
    Rule(
        141, "StorageService", "gossip",
        r"^Node /(?P<endpoint>[\d.]+) state jump to (?P<state>\w+)$",
        event_category="gossip", event_type="state_jump",
    ),
    Rule(
        142, "StorageService", "startup",
        r"^Using saved tokens \[(?P<tokens_list>[^\]]*)\]$",
        event_category="startup", event_type="saved_tokens",
    ),
    Rule(
        150, "CassandraDaemon", "startup",
        r"^JVM vendor/version: (?P<jvm>.*)$",
        event_category="startup", event_type="jvm",
    ),
    Rule(
        151, "CassandraDaemon", "startup",
        r"^Classpath: (?P<classpath>.*)$",
        event_category="startup", event_type="classpath",
    ),
    Rule(
        160, "Memtable", "flush",
        r"^CFS\(Keyspace='(?P<keyspace>[^']+)', ColumnFamily='(?P<table>[^']+)'\) "
        r"liveRatio is (?P<live_ratio>[\d.]+) \(just-counted was (?P<just_counted>[\d.]+)\)\.",
        converters={"live_ratio": "float", "just_counted": "float"},
        event_category="flush", event_type="live_ratio",
    ),
    Rule(
        170, "CompactionController", "compaction",
        r"^Compacting large (?:row|partition) (?P<keyspace_table>\S+):(?P<partition_key>\S+) "
        r"\((?P<bytes>\d+) bytes\) incrementally$",
        converters={"bytes": "int"},
        promote={"bytes": "bytes_in"},
        event_category="compaction", event_type="large_partition",
    ),
    Rule(
        180, "SSTableDeletingTask", "sstable",
        r"^Unable to delete (?P<filename>\S+) \(it will be removed on server restart; "
        r"we'll also retry after GC\)$",
        event_category="sstable", event_type="delete_failed",
    ),
    Rule(
        190, "Gossiper", "gossip",
        r"^Announcing shutdown$",
        event_category="gossip", event_type="shutdown",
    ),
    Rule(
        191, "Gossiper", "gossip",
        r"^Node /(?P<endpoint>[\d.]+) has restarted, now UP$",
        event_category="gossip", event_type="node_restarted",
    ),
    Rule(
        200, "OutboundTcpConnection", "network",
        r"^Cannot handshake version with /(?P<endpoint>[\d.]+)$",
        event_category="network", event_type="handshake_failed",
    ),
    Rule(
        210, "HintedHandOffManager", "hints",
        r"^Started hinted handoff for host: (?P<host_id>\S+) with IP: /(?P<endpoint>[\d.]+)$",
        event_category="hints", event_type="handoff_begin",
    ),
    Rule(
        211, "HintedHandOffManager", "hints",
        r"^Deleting any stored hints for /(?P<endpoint>[\d.]+)$",
        event_category="hints", event_type="hints_deleted",
    ),
    Rule(
        220, "CommitLog", "commitlog",
        r"^No commitlog files found; skipping replay$",
        event_category="commitlog", event_type="no_replay",
    ),
    Rule(
        221, "CommitLogReplayer", "commitlog",
        r"^Log replay complete, (?P<replayed_mutations>\d+) replayed mutations$",
        converters={"replayed_mutations": "int"},
        promote={"replayed_mutations": "count"},
        event_category="commitlog", event_type="replay_complete",
    ),
    Rule(
        230, "SecondaryIndexManager", "index",
        r"^Creating new index : ColumnDefinition\{(?P<definition>.*)\}$",
        event_category="index", event_type="create",
    ),
    Rule(
        231, "SecondaryIndexManager", "index",
        r"^Submitting index build of (?P<index_name>\S+) for data in (?P<sstables>.*)$",
        event_category="index", event_type="build",
    ),
    Rule(
        240, "MigrationManager", "schema",
        r"^Create new table: (?P<table_def>.*)$",
        event_category="schema", event_type="create_table",
    ),
    Rule(
        241, "MigrationManager", "schema",
        r"^Update table '(?P<keyspace_table>[^']+)' From (?P<from_def>.*) To (?P<to_def>.*)$",
        event_category="schema", event_type="update_table",
    ),
    Rule(
        250, "ThriftServer", "cql",
        r"^Listening for thrift clients\.\.\.$",
        event_category="thrift", event_type="listen",
    ),
    Rule(
        260, "SlabPoolCleaner", "flush",
        r"^Flushing largest CFS\(Keyspace='(?P<keyspace>[^']+)', ColumnFamily="
        r"'(?P<table>[^']+)'\) to free up room\. Used total: (?P<used_ratio>[\d.]+)/"
        r"(?P<reclaimable_ratio>[\d.]+), live: (?P<live_ratio>[\d.]+)/"
        r"(?P<live_reclaimable>[\d.]+), flushing: (?P<flushing_ratio>[\d.]+)/"
        r"(?P<flushing_reclaimable>[\d.]+), this: (?P<this_ratio>[\d.]+)/"
        r"(?P<this_reclaimable>[\d.]+)$",
        converters={k: "float" for k in (
            "used_ratio", "reclaimable_ratio", "live_ratio", "live_reclaimable",
            "flushing_ratio", "flushing_reclaimable", "this_ratio", "this_reclaimable")},
        event_category="flush", event_type="slab_flush",
    ),
    Rule(
        270, "AntiEntropyService", "repair",
        r"^\[repair #(?P<session_id>[^\]]+)\] new session: will sync (?P<nodes>.*) on "
        r"range \((?P<range_start>-?\d+),(?P<range_end>-?\d+)\] for "
        r"(?P<keyspace>\S+)\.\[(?P<tables>[^\]]+)\]$",
        converters={"range_start": "int", "range_end": "int"},
        event_category="repair", event_type="session_start",
    ),
    Rule(
        271, "AntiEntropyService", "repair",
        r"^\[repair #(?P<session_id>[^\]]+)\] session completed successfully$",
        event_category="repair", event_type="session_end",
    ),
    # --- DSE / Solr (solr.py [R-M]) ----------------------------------------
    Rule(
        300, "DseDaemon", "startup",
        r"^DSE version: (?P<dse_version>[\d.]+)$",
        event_product="dse", event_category="startup", event_type="dse_version",
    ),
    Rule(
        310, "SolrCore", "solr",
        r"^\[(?P<core>\S+)\] Opening new SolrCore at (?P<path>\S+)$",
        event_product="solr", event_category="solr", event_type="core_open",
    ),
    Rule(
        311, "SolrCore", "solr",
        r"^\[(?P<core>\S+)\] webapp=(?P<webapp>\S+) path=(?P<path>\S+) "
        r"params=\{(?P<params>[^}]*)\} hits=(?P<hits>\d+) status=(?P<status>\d+) "
        r"QTime=(?P<qtime>\d+)$",
        converters={"hits": "int", "status": "int", "qtime": "int"},
        promote={"qtime": "duration_ms", "hits": "count"},
        event_product="solr", event_category="solr", event_type="query",
    ),
    Rule(
        320, "AbstractSolrSecondaryIndex", "solr",
        r"^Reindexing (?P<count>\d+) commit log updates for core (?P<core>\S+)$",
        converters={"count": "int"},
        promote={"count": "count"},
        event_product="solr", event_category="solr", event_type="reindex",
    ),
]

FAMILIES: list[str] = sorted({r.family for r in RULES} | {UNKNOWN_FAMILY})

# Typed columns promoted out of the sparse `fields` map (queryable fast path).
PROMOTED_COLUMNS: list[tuple[str, str]] = [
    ("duration_ms", "long"),
    ("bytes_in", "long"),
    ("bytes_out", "long"),
    ("count", "long"),
]


def compile_rulebook(rules: list[Rule] | None = None) -> dict:
    """Compile the declarative table into the picklable broadcast form.

    ``by_class`` preserves declaration order per class: the reference's
    `switch` dispatch (prune to the emitting class's rules) + ordered
    first-match-wins within the class (rules.py §switch/§capture [R-H]).
    """
    rules = RULES if rules is None else rules
    by_class: dict[str, list[dict]] = {}
    for r in rules:
        by_class.setdefault(r.source_class, []).append(
            {
                "rule_id": r.rule_id,
                "family": r.family,
                "regex": r.regex,
                "groups": list(re.compile(r.regex).groupindex),
                "converters": r.converters,
                "promote": r.promote,
            }
        )
    return {"by_class": by_class, "headers": HEADER_FORMATS}


def rules_dim_rows(rules: list[Rule] | None = None) -> list[tuple]:
    """Rows for the broadcast `rules_dim` enrichment table (taxonomy join).

    Includes the unknown fallback (systemlog.py tail rule [R-M]): no rule
    matched -> still emitted, never dropped.
    """
    rules = RULES if rules is None else rules
    rows = [
        (r.rule_id, i, r.source_class, r.family, r.regex,
         r.event_product, r.event_category, r.event_type)
        for i, r in enumerate(rules)
    ]
    rows.append((UNKNOWN_RULE_ID, len(rules), "", UNKNOWN_FAMILY, "",
                 "cassandra", "unknown", "unknown"))
    return rows


RULES_DIM_SCHEMA = (
    "rule_id INT, priority INT, source_class STRING, family STRING, "
    "regex STRING, event_product STRING, event_category STRING, event_type STRING"
)
