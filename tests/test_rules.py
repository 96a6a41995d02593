"""Rule-match unit tests: FIXTURES.md §2 literal lines through BOTH paths
(pure-Python oracle and the Spark engine) must agree field-by-field —
the stand-in for re-running the reference's own rule-match fixtures
(BASELINE.json north_star)."""

import pytest

from logparse_spark.engine import parse_sequences
from logparse_spark.oracle import parse_event, parse_text
from logparse_spark.rulebook import RULES, UNKNOWN_RULE_ID
from logparse_spark.tokenizer import decode, encode

HDR20 = "INFO [{thread}] 2015-03-30 22:24:34,843 {cls}.java (line 116) {msg}"
HDR21 = "WARN [{thread}] 2015-03-30 22:24:34,843 {cls}.java:116 - {msg}"

# (class, message, expected rule_id, expected family, spot-check fields)
FIXTURE_LINES = [
    ("GCInspector", "GC for ParNew: 241 ms for 1 collections, 4315386160 used; max is 8000634880",
     1, "gc", {"gc_type": "ParNew", "duration": "241", "used": "4315386160"}),
    ("GCInspector", "ParNew GC in 374ms.  CMS Old Gen: 4265719304 -> 4460986184; Par Eden Space: 671088640 -> 0",
     2, "gc", {"duration": "374", "old_after": "4460986184"}),
    ("CompactionTask", "Compacting [SSTableReader(path='/data/ks1/t1/ks1-t1-jb-6-Data.db'), SSTableReader(path='/data/ks1/t1/ks1-t1-jb-5-Data.db')]",
     10, "compaction", {}),
    ("CompactionTask", "Compacted 2 sstables to [/data/ks1/t1/ks1-t1-jb-7,].  60,016,741 bytes to 59,542,630 (~99% of original) in 21,198ms = 2.678791MB/s.  293,339 total partitions merged to 293,338.  Partition merge counts were {1:293337, 2:1, }",
     11, "compaction",
     {"input_bytes": "60016741", "output_bytes": "59542630", "duration": "21198",
      "rate": "2.678791", "percent_of_original": "99", "total_partitions": "293339"}),
    ("ColumnFamilyStore", "Enqueuing flush of Memtable-sstable_activity@748961528(1135/11350 serialized/live bytes, 283 ops)",
     20, "flush", {"table": "sstable_activity", "serialized_bytes": "1135", "ops": "283"}),
    ("Memtable", "Writing Memtable-compactions_in_progress@1198535528(0/0 serialized/live bytes, 1 ops)",
     21, "flush", {"table": "compactions_in_progress", "ops": "1"}),
    ("Memtable", "Completed flushing /data/system/compactions_in_progress/system-compactions_in_progress-jb-6-Data.db (42 bytes) for commitlog position ReplayPosition(segmentId=1427756674843, position=139)",
     22, "flush", {"file_size": "42", "segment_id": "1427756674843", "position": "139"}),
    ("MessagingService", "24 MUTATION messages dropped in last 5000ms",
     30, "drops", {"count": "24", "message_type": "MUTATION", "window_ms": "5000"}),
    ("Gossiper", "InetAddress /10.1.2.3 is now DOWN",
     40, "gossip", {"endpoint": "10.1.2.3", "status": "DOWN"}),
    ("Gossiper", "FatClient /10.1.2.9 has been silent for 30000ms, removing from gossip",
     41, "gossip", {"endpoint": "10.1.2.9", "silent_ms": "30000"}),
    ("StatusLogger", "ReadStage                         0         0         104599         0                 0",
     50, "status", {"pool_name": "ReadStage", "completed": "104599"}),
    ("StorageService", "Cassandra version: 2.0.12", 60, "startup", {"version": "2.0.12"}),
    ("CassandraDaemon", "Heap size: 8000634880/8000634880",
     61, "startup", {"heap_used": "8000634880"}),
    ("CassandraDaemon", "Logging initialized", 62, "startup", {}),
    ("CassandraDaemon", "Exception in thread Thread[ReadStage:32,5,main]",
     63, "exception", {"exception_thread": "ReadStage:32", "priority": "5"}),
    ("OutboundTcpConnection", "Handshaking version with /10.1.2.3",
     70, "network", {"endpoint": "10.1.2.3"}),
    ("HintedHandOffManager", "Finished hinted handoff of 1342 rows to endpoint /10.1.2.4",
     80, "hints", {"rows": "1342", "endpoint": "10.1.2.4"}),
    ("SSTableReader", "Opening /data/ks1/t1/ks1-t1-jb-5 (5882 bytes)",
     90, "sstable", {"bytes": "5882"}),
    ("CommitLogReplayer", "Replaying /commitlog/CommitLog-3-1427756674842.log",
     100, "commitlog", {}),
    ("AutoSavingCache", "Saved KeyCache (14 items) in 3 ms",
     110, "cache", {"cache_type": "KeyCache", "items": "14", "duration": "3"}),
    ("Server", "Starting listening for CQL clients on /0.0.0.0:9042...",
     120, "cql", {"addr": "0.0.0.0", "port": "9042"}),
    ("BatchStatement", "Batch of prepared statements for [ks1.t1] is of size 6283, exceeding specified threshold of 5120 by 1163.",
     130, "batch", {"keyspace_table": "ks1.t1", "size": "6283", "exceed": "1163"}),
    ("NovelClass", "Some message no rule matches 12345", UNKNOWN_RULE_ID, "unknown", {}),
    # breadth rules (reference classes beyond the fixture corpus [R-M])
    ("StorageService", "JOINING: waiting for ring information", 140, "startup", {}),
    ("StorageService", "Node /10.1.2.7 state jump to normal", 141, "gossip",
     {"endpoint": "10.1.2.7", "state": "normal"}),
    ("StorageService", "Using saved tokens [-1035762459668265269, 1235]", 142, "startup", {}),
    ("CassandraDaemon", "JVM vendor/version: Java HotSpot(TM) 64-Bit Server VM/1.7.0_76", 150, "startup", {}),
    ("CassandraDaemon", "Classpath: /etc/cassandra:/usr/share/cassandra/lib/antlr-3.2.jar", 151, "startup", {}),
    ("Memtable", "CFS(Keyspace='ks1', ColumnFamily='t1') liveRatio is 10.3 (just-counted was 10.3).  calculation took 8ms for 148 cells",
     160, "flush", {"keyspace": "ks1", "table": "t1", "live_ratio": "10.3"}),
    ("CompactionController", "Compacting large row ks1.t1:user123 (104857600 bytes) incrementally",
     170, "compaction", {"keyspace_table": "ks1.t1", "partition_key": "user123", "bytes": "104857600"}),
    ("SSTableDeletingTask", "Unable to delete /data/ks1/t1/ks1-t1-jb-5-Data.db (it will be removed on server restart; we'll also retry after GC)",
     180, "sstable", {"filename": "/data/ks1/t1/ks1-t1-jb-5-Data.db"}),
    ("Gossiper", "Announcing shutdown", 190, "gossip", {}),
    ("Gossiper", "Node /10.1.2.3 has restarted, now UP", 191, "gossip", {"endpoint": "10.1.2.3"}),
    ("OutboundTcpConnection", "Cannot handshake version with /10.1.2.8", 200, "network",
     {"endpoint": "10.1.2.8"}),
    ("HintedHandOffManager", "Started hinted handoff for host: 8a9b4a0e-92cc-43f9 with IP: /10.1.2.4",
     210, "hints", {"endpoint": "10.1.2.4", "host_id": "8a9b4a0e-92cc-43f9"}),
    ("HintedHandOffManager", "Deleting any stored hints for /10.1.2.4", 211, "hints",
     {"endpoint": "10.1.2.4"}),
    ("CommitLog", "No commitlog files found; skipping replay", 220, "commitlog", {}),
    ("CommitLogReplayer", "Log replay complete, 4123 replayed mutations", 221, "commitlog",
     {"replayed_mutations": "4123"}),
    ("SecondaryIndexManager", "Creating new index : ColumnDefinition{name=6c6f63, type=UTF8Type}",
     230, "index", {}),
    ("SecondaryIndexManager", "Submitting index build of ks1.idx_loc for data in SSTableReader(path='x')",
     231, "index", {"index_name": "ks1.idx_loc"}),
    ("MigrationManager", "Create new table: org.apache.cassandra.config.CFMetaData@4717s[cfId=...]",
     240, "schema", {}),
    ("MigrationManager", "Update table 'ks1/t1' From org.apache...@1 To org.apache...@2",
     241, "schema", {"keyspace_table": "ks1/t1"}),
    ("ThriftServer", "Listening for thrift clients...", 250, "cql", {}),
    ("SlabPoolCleaner", "Flushing largest CFS(Keyspace='ks1', ColumnFamily='t1') to free up room. Used total: 0.33/0.00, live: 0.33/0.00, flushing: 0.00/0.00, this: 0.20/0.00",
     260, "flush", {"keyspace": "ks1", "table": "t1", "used_ratio": "0.33", "this_ratio": "0.2"}),
    ("AntiEntropyService", "[repair #af55s-11] new session: will sync /10.1.2.3, /10.1.2.4 on range (123,456] for ks1.[t1, t2]",
     270, "repair", {"session_id": "af55s-11", "range_start": "123", "range_end": "456", "keyspace": "ks1"}),
    ("AntiEntropyService", "[repair #af55s-11] session completed successfully", 271, "repair",
     {"session_id": "af55s-11"}),
    ("DseDaemon", "DSE version: 4.6.1", 300, "startup", {"dse_version": "4.6.1"}),
    ("SolrCore", "[ks1.t1] Opening new SolrCore at /usr/share/dse/solr/ks1.t1", 310, "solr",
     {"core": "ks1.t1"}),
    ("SolrCore", "[ks1.t1] webapp=/solr path=/select params={q=*:*} hits=42 status=0 QTime=7",
     311, "solr", {"core": "ks1.t1", "hits": "42", "qtime": "7"}),
    ("AbstractSolrSecondaryIndex", "Reindexing 1042 commit log updates for core ks1.t1",
     320, "solr", {"count": "1042"}),
]


@pytest.mark.parametrize("cls,msg,rule_id,family,want", FIXTURE_LINES,
                         ids=[f"r{r}_{c}" for c, _, r, *_ in [(c, m, r) for c, m, r, f, w in FIXTURE_LINES]])
def test_oracle_rule_match(cls, msg, rule_id, family, want):
    for hdr in (HDR20, HDR21):
        ev = parse_text(hdr.format(thread="main", cls=cls, msg=msg))
        assert ev["rule_id"] == rule_id, (cls, msg, ev)
        assert ev["family"] == family
        for k, v in want.items():
            assert ev["fields"][k] == v, (k, ev["fields"])
        assert ev["source_file"] == f"{cls}.java"
        assert ev["source_line"] == 116


def test_spark_engine_matches_oracle_on_fixtures(spark):
    rows = []
    for i, (cls, msg, *_rest) in enumerate(FIXTURE_LINES):
        for j, hdr in enumerate((HDR20, HDR21)):
            text = hdr.format(thread=f"T:{i}", cls=cls, msg=msg)
            toks = encode(text)
            rows.append((f"fx-{i}-{j}", toks, len(toks), "node-000"))
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")
    got = {r["doc_id"]: r.asDict(recursive=True) for r in parse_sequences(df).collect()}
    assert len(got) == len(rows)
    for doc_id, toks, n, src in rows:
        exp = parse_event(doc_id, toks, src)
        g = got[doc_id]
        for k in ("level", "thread_name", "thread_id", "source_file", "source_line",
                  "message", "rule_id", "family", "fields", "tokens", "n_tok", "extra"):
            assert g[k] == exp[k], (doc_id, k, g[k], exp[k])
        assert g["ts"] == exp["ts"]


def test_continuation_lines_fold_to_extra():
    text = (HDR20.format(thread="ReadStage:32", cls="CassandraDaemon",
                         msg="Exception in thread Thread[ReadStage:32,5,main]")
            + "\njava.lang.AssertionError: boom\n\tat org.x.Y.z(Y.java:1)")
    ev = parse_text(text)
    assert ev["rule_id"] == 63
    assert ev["message"] == "Exception in thread Thread[ReadStage:32,5,main]"
    assert ev["extra"] == ["java.lang.AssertionError: boom", "\tat org.x.Y.z(Y.java:1)"]


def test_tokenizer_roundtrip():
    for s in ["hello", "naïve ünïcode ✓", "", "a\nb\tc"]:
        assert decode(encode(s)) == s


def test_rule_ids_unique():
    ids = [r.rule_id for r in RULES]
    assert len(ids) == len(set(ids))
