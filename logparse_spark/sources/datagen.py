"""Deterministic synthetic `sequences` corpus (FIXTURES.md §1/§2 spec).

Input shape is BINDING (BASELINE.json input_hint):
    sequences(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)

Properties:
- fully deterministic per (seed, row_id) — independent of partitioning,
  so the same corpus regenerates identically at any parallelism;
- zipf-skewed (s=1.2) source distribution so hot-source salting (P7) is
  actually exercised;
- 70% Cassandra 2.0 header format / 30% 2.1 format; 2% continuation
  blocks (exceptions always get one); 3% unknown-class rows that must
  route to the `unknown` sink;
- generated DISTRIBUTED: ``spark.range(n).mapInPandas`` — no driver-side
  materialization, so the generator itself scales to arbitrary n.

Per-row Python here is fine — this is test datagen, not the engine.
"""

from __future__ import annotations

import functools
import random
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEQUENCES_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"

N_SOURCES = 50
ZIPF_S = 1.2
BASE_TS = datetime(2015, 3, 30, 0, 0, 0)

_KEYSPACES = ["ks1", "system", "metrics", "userdata"]
_TABLES = ["t1", "events", "sstable_activity", "compactions_in_progress", "peers"]
_POOLS = ["ReadStage", "MutationStage", "FlushWriter", "GossipStage", "CompactionExecutor"]
_CACHES = ["KeyCache", "RowCache", "CounterCache"]
_MSG_TYPES = ["MUTATION", "READ", "READ_REPAIR", "REQUEST_RESPONSE"]
_GC_TYPES = ["ParNew", "ConcurrentMarkSweep"]
_VERSIONS = ["2.0.12", "2.0.14", "2.1.13"]
_UNKNOWN_CLASSES = ["FooBarService", "QuantumFlux", "MysteryModule"]

# zipf CDF over sources (hot node-000 dominates)
_zw = 1.0 / np.arange(1, N_SOURCES + 1) ** ZIPF_S
_ZIPF_CDF = np.cumsum(_zw / _zw.sum())


def _ip(r: random.Random) -> str:
    return f"10.{r.randint(0, 3)}.{r.randint(0, 9)}.{r.randint(1, 254)}"


def _sstable(r: random.Random) -> str:
    ks, t = r.choice(_KEYSPACES), r.choice(_TABLES)
    return f"/data/{ks}/{t}/{ks}-{t}-jb-{r.randint(1, 999)}"


# Version-family tags (approximate, public-knowledge line provenance):
# coarse release eras a given line SHAPE plausibly appears in.  "dse"
# rides the 2.1-era core (DSE 4.x) plus the Solr-only classes.  Used
# only by the versioned datagen mode; untagged templates are era-stable
# shapes emitted by every family.
_ALL = ("1.2", "2.0", "2.1", "3.x", "dse")
_OLD = ("1.2", "2.0")                    # pre-2.1 formats
_PRE3 = ("1.2", "2.0", "2.1", "dse")     # dropped/reworded in 3.x
_MID = ("2.1", "dse")                    # 2.1-era introductions
_MIDNEW = ("2.1", "3.x", "dse")          # 2.1+ (incl. 2.2 era)
_NEW = ("3.x",)                          # 3.x renames / new subsystems
_DSE = ("dse",)                          # Solr / DSE-only classes
VERSION_FAMILIES = _ALL


# (weight, emitting class, thread pool, level policy, message_fn[, versions])
# Templates MUST stay in lockstep with rulebook.RULES regexes.  Order,
# weights, and lambdas are FROZEN (the default corpus must regenerate
# bit-identically); the optional trailing element only gates the
# versioned mode.
def _templates():
    return [
        (0.18, "GCInspector", "ScheduledTasks:1", None, lambda r: (
            f"GC for {r.choice(_GC_TYPES)}: {r.randint(50, 900)} ms for "
            f"{r.randint(1, 3)} collections, {r.randint(10**8, 8 * 10**9)} used; "
            f"max is {r.choice([8000634880, 4000317440])}"), _OLD),
        (0.05, "GCInspector", "Service Thread", None, lambda r: (
            f"{r.choice(_GC_TYPES)} GC in {r.randint(100, 600)}ms.  CMS Old Gen: "
            f"{r.randint(10**8, 5 * 10**9)} -> {r.randint(10**8, 5 * 10**9)}; "
            f"Par Eden Space: {r.randint(0, 7 * 10**8)} -> {r.randint(0, 10**6)}"), _MID),
        (0.08, "CompactionTask", "CompactionExecutor:4", None, lambda r: (
            "Compacting [" + ", ".join(
                f"SSTableReader(path='{_sstable(r)}-Data.db')"
                for _ in range(r.randint(2, 4))) + "]")),
        (0.08, "CompactionTask", "CompactionExecutor:4", None, lambda r: (
            f"Compacted {r.randint(2, 8)} sstables to [{_sstable(r)},].  "
            f"{r.randint(10**6, 10**8):,} bytes to {r.randint(10**6, 10**8):,} "
            f"(~{r.randint(30, 100)}% of original) in {r.randint(1000, 99999):,}ms = "
            f"{r.uniform(0.5, 40.0):.6f}MB/s.  {r.randint(10**4, 10**6):,} total "
            f"partitions merged to {r.randint(10**4, 10**6):,}.  "
            f"Partition merge counts were {{{r.randint(1, 9)}:{r.randint(10, 10**5)}, }}")),
        (0.07, "ColumnFamilyStore", "FlushWriter:2", None, lambda r: (
            f"Enqueuing flush of Memtable-{r.choice(_TABLES)}@{r.randint(10**8, 2 * 10**9)}"
            f"({r.randint(100, 10**7)}/{r.randint(100, 10**7)} serialized/live bytes, "
            f"{r.randint(1, 10**5)} ops)"), _PRE3),
        (0.07, "Memtable", "FlushWriter:2", None, lambda r: (
            f"Writing Memtable-{r.choice(_TABLES)}@{r.randint(10**8, 2 * 10**9)}"
            f"({r.randint(0, 10**7)}/{r.randint(0, 10**7)} serialized/live bytes, "
            f"{r.randint(1, 10**5)} ops)"), _PRE3),
        (0.07, "Memtable", "FlushWriter:2", None, lambda r: (
            f"Completed flushing {_sstable(r)}-Data.db ({r.randint(42, 10**8)} bytes) "
            f"for commitlog position ReplayPosition(segmentId={r.randint(10**12, 2 * 10**12)}, "
            f"position={r.randint(0, 10**7)})"), _PRE3),
        (0.05, "MessagingService", "ScheduledTasks:1", "WARN", lambda r: (
            f"{r.randint(1, 5000)} {r.choice(_MSG_TYPES)} messages dropped in last 5000ms"), _PRE3),
        (0.06, "Gossiper", "GossipStage:1", None, lambda r: (
            f"InetAddress /{_ip(r)} is now {r.choice(['UP', 'DOWN'])}")),
        (0.01, "Gossiper", "GossipStage:1", None, lambda r: (
            f"FatClient /{_ip(r)} has been silent for 30000ms, removing from gossip")),
        (0.08, "StatusLogger", "ScheduledTasks:1", None, lambda r: (
            f"{r.choice(_POOLS):<25s}{r.randint(0, 64):>10d}{r.randint(0, 9999):>10d}"
            f"{r.randint(0, 10**7):>15d}{r.randint(0, 3):>10d}{r.randint(0, 100):>18d}")),
        (0.02, "StorageService", "main", None, lambda r: (
            f"Cassandra version: {r.choice(_VERSIONS)}")),
        (0.02, "CassandraDaemon", "main", None, lambda r: (
            f"Heap size: {r.randint(10**9, 8 * 10**9)}/8000634880")),
        (0.01, "CassandraDaemon", "main", None, lambda r: "Logging initialized"),
        (0.03, "OutboundTcpConnection", "WRITE-/10.1.2.3", None, lambda r: (
            f"Handshaking version with /{_ip(r)}")),
        (0.02, "HintedHandOffManager", "HintedHandoff:1", None, lambda r: (
            f"Finished hinted handoff of {r.randint(1, 99999)} rows to endpoint /{_ip(r)}"), _PRE3),
        (0.03, "SSTableReader", "main", None, lambda r: (
            f"Opening {_sstable(r)} ({r.randint(100, 10**9)} bytes)")),
        (0.01, "CommitLogReplayer", "main", None, lambda r: (
            f"Replaying /commitlog/CommitLog-3-{r.randint(10**12, 2 * 10**12)}.log")),
        (0.02, "AutoSavingCache", "CompactionExecutor:2", None, lambda r: (
            f"Saved {r.choice(_CACHES)} ({r.randint(1, 10**5)} items) in "
            f"{r.randint(1, 500)} ms")),
        (0.01, "Server", "main", None, lambda r: (
            "Starting listening for CQL clients on /0.0.0.0:9042...")),
        (0.01, "BatchStatement", "Native-Transport-Requests:12", "WARN", lambda r: (
            (lambda sz, thr: f"Batch of prepared statements for "
             f"[{r.choice(_KEYSPACES)}.{r.choice(_TABLES)}] is of size {sz}, "
             f"exceeding specified threshold of {thr} by {sz - thr}.")
            (r.randint(5200, 99999), 5120)), ("2.0", "2.1", "3.x", "dse")),
        (0.02, "CassandraDaemon", "ReadStage:32", "ERROR", lambda r: (
            f"Exception in thread Thread[ReadStage:{r.randint(1, 64)},5,main]")),
        (0.03, None, "main", None, lambda r: (  # unknown class -> unknown sink
            f"Some message no rule matches {r.randint(0, 99999)}")),
        # --- round-2 rule families (exercise the expanded rulebook E2E) ----
        (0.01, "GCInspector", "Service Thread", None, lambda r: (
            f"G1 Young Generation GC in {r.randint(100, 500)}ms.  G1 Eden Space: "
            f"{r.randint(10**8, 4 * 10**9)} -> 0; G1 Old Gen: "
            f"{r.randint(10**8, 10**9)} -> {r.randint(10**8, 10**9)};"), _MIDNEW),
        (0.01, "StatusLogger", "ScheduledTasks:1", None, lambda r: (
            "Pool Name                    Active   Pending      Completed   "
            "Blocked  All Time Blocked")),
        (0.02, "Memtable", "MemtableFlushWriter:3", None, lambda r: (
            f"Writing Memtable-{r.choice(_TABLES)}@{r.randint(10**8, 2 * 10**9)}"
            f"({r.uniform(0.1, 900.0):.3f}KiB serialized bytes, {r.randint(1, 10**5)} ops, "
            f"{r.randint(0, 40)}%/{r.randint(0, 10)}% of on/off-heap limit)"), _MIDNEW),
        (0.02, "SliceQueryFilter", "ReadStage:12", "WARN", lambda r: (
            f"Read {r.randint(100, 5000)} live and {r.randint(1000, 99999)} tombstone "
            f"cells in {r.choice(_KEYSPACES)}.{r.choice(_TABLES)} for key: "
            f"user{r.randint(1, 9999)} (see tombstone_warn_threshold). "
            f"{r.randint(100, 10000)} columns were requested, slices=[-]"), ("2.0", "2.1", "dse")),
        (0.01, "ReadCommand", "ReadStage-2", "WARN", lambda r: (
            f"Read {r.randint(1, 999)} live rows and {r.randint(1001, 99999)} tombstone "
            f"cells for query SELECT * FROM {r.choice(_KEYSPACES)}.{r.choice(_TABLES)} "
            f"LIMIT {r.randint(10, 5000)} (see tombstone_warn_threshold)"), _NEW),
        (0.02, "StreamResultFuture", "STREAM-IN-/10.0.1.5", None, lambda r: (
            f"[Stream #{r.randint(10**7, 9 * 10**7):x}-{r.randint(1000, 9999):x}] "
            f"Session with /{_ip(r)} is complete"), _MIDNEW),
        (0.01, "StreamSession", "STREAM-OUT-/10.0.1.6", None, lambda r: (
            f"[Stream #{r.randint(10**7, 9 * 10**7):x}-{r.randint(1000, 9999):x}] "
            f"Starting streaming to /{_ip(r)}"), _MIDNEW),
        (0.02, "RepairSession", "AntiEntropySessions:3", None, lambda r: (
            f"[repair #{r.randint(10**7, 9 * 10**7):x}-{r.randint(1000, 9999):x}] "
            f"Received merkle tree for {r.choice(_TABLES)} from /{_ip(r)}")),
        (0.01, "HintsDispatchExecutor", "HintsDispatcher:2", None, lambda r: (
            f"Finished hinted handoff of file {r.randint(10**7, 9 * 10**7):x}-1.hints "
            f"to endpoint /{_ip(r)}: {r.randint(10**7, 9 * 10**7):x}"), _NEW),
        (0.01, "CacheService", "main", None, lambda r: (
            f"Initializing {r.choice(['key', 'row', 'counter'])} cache with capacity "
            f"of {r.randint(10, 512)} MBs.")),
        (0.01, "MigrationManager", "MigrationStage:1", None, lambda r: (
            f"Drop table '{r.choice(_KEYSPACES)}/{r.choice(_TABLES)}'")),
        (0.01, "NoSpamLogger", "SharedPool-Worker-1", "WARN", lambda r: (
            f"Maximum memory usage reached ({r.randint(128, 1024)}.000MiB), "
            f"cannot allocate chunk of 1.000MiB"), _NEW),
        # --- round-3 rule families (batches 5/6 exercised E2E) --------------
        (0.004, "Differencer", "AntiEntropyStage:1", None, lambda r: (
            f"[repair #{r.randint(10**7, 9 * 10**7):x}-{r.randint(1000, 9999):x}] "
            f"Endpoints /{_ip(r)} and /{_ip(r)} are consistent for {r.choice(_TABLES)}"), _PRE3),
        (0.003, "RepairSession", "AntiEntropySessions:2", None, lambda r: (
            f"[repair #{r.randint(10**7, 9 * 10**7):x}-{r.randint(1000, 9999):x}] "
            f"Requesting merkle trees for {r.choice(_TABLES)} "
            f"(to [/{_ip(r)}, /{_ip(r)}])")),
        (0.002, "StartupChecks", "main", "WARN", lambda r: (
            "JMX is not enabled to receive remote connections. "
            "Please see cassandra-env.sh for more info."), _MIDNEW),
        (0.002, "NativeLibrary", "main", None, lambda r: "JNA mlockall successful", _NEW),
        (0.002, "Ref", "Reference-Reaper:1", "ERROR", lambda r: (
            f"LEAK DETECTED: a reference (org.apache.cassandra.utils.concurrent."
            f"Ref$State@{r.randint(10**7, 9 * 10**7):x}) to class org.apache."
            f"cassandra.io.sstable.format.SSTableReader$InstanceTidier@"
            f"{r.randint(10**8, 2 * 10**9)}:{_sstable(r)} was not released "
            f"before the reference was garbage collected"), _MIDNEW),
        (0.003, "Message", "Native-Transport-Requests:7", "ERROR", lambda r: (
            f"Unexpected exception during request; channel = [id: 0x{r.randint(10**7, 9 * 10**7):08x}, "
            f"/{_ip(r)}:{r.randint(30000, 60000)} => /{_ip(r)}:9042]"), _MIDNEW),
        (0.003, "SolrCore", "qtp1234-56", None, lambda r: (
            f"[{r.choice(_KEYSPACES)}.{r.choice(_TABLES)}] Registered new searcher "
            f"Searcher@{r.randint(10**7, 9 * 10**7):x}[{r.choice(_KEYSPACES)}."
            f"{r.choice(_TABLES)}] main{{StandardDirectoryReader(segments_2:"
            f"{r.randint(1, 99)}:nrt)}}"), _DSE),
        (0.004, "GCInspector", "ScheduledTasks:1", None, lambda r: (
            f"GC for {r.choice(_GC_TYPES)}: {r.randint(50, 900)} ms, "
            f"{r.randint(10**7, 10**9)} reclaimed leaving {r.randint(10**8, 8 * 10**9)} "
            f"used; max is {r.choice([8000634880, 4000317440])}"), _NEW),
        (0.002, "Scrubber", "CompactionExecutor:9", None, lambda r: (
            f"Scrubbing SSTableReader(path='{_sstable(r)}-Data.db') "
            f"({r.randint(100, 10**9)} bytes)")),
        (0.002, "StorageService", "RMI TCP Connection(3)-127.0.0.1", None, lambda r: (
            "LEAVING: sleeping 30000 ms for batch processing and pending range setup")),
        # --- batch 7/8 rule families exercised E2E --------------------------
        (0.002, "Mx4jTool", "main", None, lambda r: (
            "Will not load MX4J, mx4j-tools.jar is not in the classpath")),
        (0.002, "StorageService", "main", None, lambda r: (
            f"Generated random tokens. tokens are [{', '.join(str(r.randint(-2**63, 2**63 - 1)) for _ in range(3))}]")),
        (0.002, "CompactionStrategyManager", "CompactionExecutor:3", None, lambda r: (
            f"Recreating compaction strategy - disk boundaries are out of date "
            f"for {r.choice(_KEYSPACES)}.{r.choice(_TABLES)}."), _NEW),
        (0.002, "SolrCoreResourceManager", "coreLoadExecutor-5-thread-1", None, lambda r: (
            f"Trying to load resource schema.xml for core "
            f"{r.choice(_KEYSPACES)}.{r.choice(_TABLES)} by querying from "
            f"local node with CL {r.choice(['QUORUM', 'ONE'])}"), _DSE),
        (0.002, "Memtable", "FlushWriter:2", None, lambda r: (
            f"Completed flushing {_sstable(r)}-Data.db ({r.randint(10**3, 10**8)} bytes)"), _NEW),
        (0.002, "RequestHandlers", "coreLoadExecutor-5-thread-1", None, lambda r: (
            f"created {r.choice(['/select', '/update', '/admin/luke'])}: "
            f"solr.{r.choice(['SearchHandler', 'UpdateRequestHandler'])}"), _DSE),
        # --- batch 9 rule families exercised E2E --------------------------
        (0.002, "CassandraDaemon", "main", None, lambda r: (
            f"Scheduling approximate time-check task with a precision of "
            f"{r.choice([10, 2])} milliseconds"), _NEW),
        (0.002, "CassandraDaemon", "main", None, lambda r: (
            f"completed pre-loading ({r.randint(1, 10**5)} keys) key cache.")),
        (0.002, "NativeTransportService", "main", None, lambda r: (
            f"Netty using {r.choice(['native Epoll event loop', 'Java NIO event loop'])}"), _NEW),
        (0.002, "MessagingService", "ScheduledTasks:1", "INFO", lambda r: (
            f"{r.choice(_MSG_TYPES)} messages were dropped in last 5000 ms: "
            f"{r.randint(0, 99)} internal and {r.randint(0, 99)} cross node"), _NEW),
        (0.002, "QueryProcessor", "main", None, lambda r: (
            f"Initialized prepared statement caches with {r.randint(8, 64)} MB "
            f"(native) and {r.randint(8, 64)} MB (Thrift)"), _NEW),
        (0.002, "StorageService", "main", None, lambda r: (
            "Starting shadow gossip round to check for endpoint collision"), _NEW),
        (0.002, "SolrDeletionPolicy", "coreLoadExecutor-5-thread-1", None, lambda r: (
            f"SolrDeletionPolicy.onInit: commits: num={r.randint(1, 9)}"), _DSE),
        (0.002, "IndexSchema", "coreLoadExecutor-5-thread-1", None, lambda r: (
            f"unique key field: {r.choice(['id', 'key', 'uuid'])}"), _DSE),
    ]


_TEMPLATES = _templates()
_TPL_CDF = np.cumsum(np.array([w for w, *_ in _TEMPLATES]) / sum(w for w, *_ in _TEMPLATES))


def _tpl_versions(t) -> tuple[str, ...]:
    return t[5] if len(t) > 5 else _ALL


# per-family template index lists + renormalized CDFs (versioned mode)
_TPL_IDX_BY_FAMILY = {
    fam: [i for i, t in enumerate(_TEMPLATES) if fam in _tpl_versions(t)]
    for fam in VERSION_FAMILIES
}
_TPL_FAMILY_CDF = {
    fam: np.cumsum(np.array([_TEMPLATES[i][0] for i in idxs])
                   / sum(_TEMPLATES[i][0] for i in idxs))
    for fam, idxs in _TPL_IDX_BY_FAMILY.items()
}

# realistic mixed-cluster version skew (a fleet mid-upgrade): most nodes
# on 2.1/3.x, a long 2.0 tail, a few stragglers and DSE nodes
DEFAULT_VERSION_MIX = {"1.2": 0.05, "2.0": 0.25, "2.1": 0.30, "3.x": 0.30,
                       "dse": 0.10}


@functools.lru_cache(maxsize=64)
def _family_base_offset(seed: int) -> float:
    # hoisted out of the per-row path: make_event calls
    # source_version_family once per row in versioned mode, and a fresh
    # Random(seed) per call would re-seed a Mersenne Twister per row
    return random.Random(seed).random()


def source_version_family(src_i: int, seed: int = 42) -> str:
    """Deterministic version family for a source node (a node runs ONE
    version — the realistic mixed-cluster shape, and the same pinning a
    nodes_dim enrich join would expose).  Golden-ratio low-discrepancy
    sequence instead of an independent draw per node: a 50-node fleet
    then hits every family at ~its mix proportion (an iid draw leaves a
    5%-weight family empty ~8% of the time)."""
    u = (_family_base_offset(seed) + src_i * 0.6180339887498949) % 1.0
    acc = 0.0
    for fam, wgt in DEFAULT_VERSION_MIX.items():
        acc += wgt
        if u < acc:
            return fam
    return "3.x"


def make_event(
    rid: int, seed: int = 42, version: str | None = None,
    versioned: bool = False,
) -> tuple[str, list[int], int, str]:
    """One deterministic `sequences` row for global row id `rid`.

    Default mode (version=None, versioned=False) is FROZEN — it must
    regenerate historical corpora bit-identically.  The versioned mode
    (explicit `version`, or `versioned=True` for per-source family
    pinning) draws only from that family's template subset and uses the
    family's header format — a corpus whose line-shape mix the rulebook
    was NOT grown in lockstep with (COVERAGE.md reports per-family
    match rates)."""
    r = random.Random((seed << 34) ^ (rid * 0x9E3779B9))
    src_i = int(np.searchsorted(_ZIPF_CDF, r.random(), side="right"))
    source = f"node-{min(src_i, N_SOURCES - 1):03d}"
    if version is None and versioned:
        version = source_version_family(min(src_i, N_SOURCES - 1), seed)
    tpl_rand = r.random()
    if version is None:
        tpl = _TEMPLATES[min(int(np.searchsorted(_TPL_CDF, tpl_rand, side="right")),
                             len(_TEMPLATES) - 1)]
    else:
        idxs = _TPL_IDX_BY_FAMILY[version]
        j = int(np.searchsorted(_TPL_FAMILY_CDF[version], tpl_rand, side="right"))
        tpl = _TEMPLATES[idxs[min(j, len(idxs) - 1)]]
    _, cls, thread, level_fixed, msg_fn = tpl[:5]
    if cls is None:
        cls = r.choice(_UNKNOWN_CLASSES)
    message = msg_fn(r)
    if level_fixed:
        level = level_fixed
    else:
        u = r.random()
        level = "INFO" if u < 0.88 else ("WARN" if u < 0.97 else "ERROR")
    ts = BASE_TS + timedelta(seconds=rid % (30 * 86400), milliseconds=r.randint(0, 999))
    date = ts.strftime("%Y-%m-%d %H:%M:%S,") + f"{ts.microsecond // 1000:03d}"
    line_no = r.randint(40, 999)
    if version is None:
        use_old = r.random() < 0.70  # historical 70/30 header mix
    else:
        use_old = version in _OLD  # header format follows the version
    if use_old:  # Cassandra 1.2/2.0 format
        text = f"{level} [{thread}] {date} {cls}.java (line {line_no}) {message}"
    else:  # 2.1+ format
        text = f"{level} [{thread}] {date} {cls}.java:{line_no} - {message}"
    is_exception = message.startswith("Exception in thread")
    if is_exception or r.random() < 0.02:
        frames = "\n".join(
            f"\tat org.apache.cassandra.pkg{r.randint(1, 9)}.Cls{r.randint(1, 99)}"
            f".method{r.randint(1, 20)}(Cls.java:{r.randint(10, 999)})"
            for _ in range(r.randint(2, 6)))
        text += f"\njava.lang.AssertionError: assertion failed {r.randint(0, 999)}\n{frames}"
    tokens = list(text.encode("utf-8"))
    return f"{source}-{rid:012d}", tokens, len(tokens), source


def generate_pdf(ids, seed: int = 42, version: str | None = None,
                 versioned: bool = False) -> pd.DataFrame:
    rows = [make_event(int(i), seed, version, versioned) for i in ids]
    return pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])


def generate_sequences(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None,
    version: str | None = None, versioned: bool = False,
) -> DataFrame:
    """Distributed generation: deterministic regardless of partitioning.

    `version` forces every row into one version family;
    `versioned=True` pins a deterministic family per source node
    (DEFAULT_VERSION_MIX skew) — the mixed-version cluster corpus."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def fn(batches):
        for pdf in batches:
            if len(pdf):
                yield generate_pdf(pdf["id"].to_numpy(), seed, version, versioned)

    return spark.range(0, n, 1, partitions).mapInPandas(fn, SEQUENCES_SCHEMA)


_SALT_TARGET_FILE_BYTES = 8 << 20  # ~8 MB files: 2 fit in one 16 MB split
_SALT_BYTES_PER_ROW = 120  # measured: 230 MB / 2M rows snappy parquet


def _source_salts(n: int, n_buckets: int) -> list[int]:
    """Files per (source, bucket) dir, indexed by source rank.

    Frequency-aware: a dir gets as many writer splits as its EXPECTED
    bytes warrant (zipf share x corpus size), so the hot source's dirs
    split enough for the downstream scan to parallelize over them while
    the cold tail stays one file per dir.  A uniform salt is wrong in
    both directions at once — it under-splits the hot dir at large n
    and multiplies tiny files at small n (a real 8x-files regression,
    ~3x the parse-stage task count via openCostInBytes, found in r5
    when the aliased uniform salt first became effective)."""
    shares = _zw / _zw.sum()
    per_dir_bytes = shares * (n * _SALT_BYTES_PER_ROW / n_buckets)
    return [int(min(8, max(1, np.ceil(b / _SALT_TARGET_FILE_BYTES))))
            for b in per_dir_bytes]


def write_sequences(
    spark: SparkSession, path: str, n: int, seed: int = 42,
    n_buckets: int = 4, partitions: int | None = None,
    versioned: bool = False,
) -> None:
    """Materialize the corpus with the production partition layout
    (source, bucket(doc_id)) — partition-pruned scans + ledger granularity.

    `versioned=True` materializes the mixed-fleet corpus (per-source
    version family, family-specific templates + header formats)."""
    df = generate_sequences(spark, n, seed, partitions, versioned=versioned)
    df = df.withColumn("bucket", F.pmod(F.crc32(F.col("doc_id")), F.lit(n_buckets)))
    # cluster on the partition keys (+salt) so files-per-dir stays bounded
    # instead of tasks x dirs (same discipline as operators/route.py);
    # the salt divisor is per-source (_source_salts), and the hash input
    # is a distinct string: pmod(crc32(doc_id), k) would share its low
    # bits with bucket = crc32(doc_id) % n_buckets, silently cutting the
    # effective per-dir split to k/n_buckets (see route.py)
    salts = _source_salts(n, n_buckets)
    salt_arr = "array(" + ",".join(map(str, salts)) + ")"
    salt = F.expr(
        "pmod(crc32(concat(doc_id, '#w')), "
        f"{salt_arr}[cast(substring(source, 6, 3) as int)])"
    )
    df = df.repartition(F.col("source"), F.col("bucket"), salt)
    df.write.mode("overwrite").partitionBy("source", "bucket").parquet(path)


def nodes_dim_pdf(n_sources: int = N_SOURCES, seed: int = 42) -> pd.DataFrame:
    """Enrich dimension (broadcastable): node -> dc/rack/version/ip."""
    r = random.Random(seed)
    rows = [
        (f"node-{i:03d}", f"dc{i % 3 + 1}", f"r{i % 4 + 1}",
         r.choice(_VERSIONS), f"10.{i % 4}.{i // 10}.{i % 250 + 1}")
        for i in range(n_sources)
    ]
    return pd.DataFrame(rows, columns=["source", "datacenter", "rack",
                                       "cassandra_version", "host_ip"])


NODES_SCHEMA = "source string, datacenter string, rack string, cassandra_version string, host_ip string"


def nodes_dim(spark: SparkSession, n_sources: int = N_SOURCES, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(nodes_dim_pdf(n_sources, seed), schema=NODES_SCHEMA)
