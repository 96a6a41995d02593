"""End-to-end pipeline tests: the binding invariants (BASELINE.json):

- per-row token-array equality on every routed row, every sink;
- every doc_id lands in exactly one sink (never dropped, never duped);
- per-sink aggregate counts == the oracle's counts on the same corpus.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from logparse_spark.main import run_pipeline
from logparse_spark.operators.aggregate import rule_histogram, source_level_rollup
from logparse_spark.operators.route import read_sink
from logparse_spark.oracle import parse_event
from logparse_spark.sources.datagen import generate_pdf, generate_sequences

N = 4000


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipeline"))
    seq = generate_sequences(spark, N, partitions=4)
    metrics = run_pipeline(spark, seq, out, n_buckets=2)
    return out, metrics


@pytest.fixture(scope="module")
def oracle_events():
    pdf = generate_pdf(range(N))
    return [
        parse_event(r.doc_id, list(r.tokens), r.source)
        for r in pdf.itertuples()
    ]


def test_observation_metrics(pipeline_out):
    _, metrics = pipeline_out
    assert metrics["routed_rows"] == N
    assert metrics["unknown_rows"] > 0


def test_every_doc_in_exactly_one_sink(spark, pipeline_out):
    out, _ = pipeline_out
    routed = read_sink(spark, f"{out}/sinks")
    assert routed.count() == N
    assert routed.select("doc_id").distinct().count() == N


def test_token_equality_every_routed_row(spark, pipeline_out, oracle_events):
    """THE binding per-row invariant: tokens bit-identical in every sink."""
    out, _ = pipeline_out
    routed = read_sink(spark, f"{out}/sinks").select("doc_id", "tokens", "n_tok", "family").collect()
    exp = {e["doc_id"]: e for e in oracle_events}
    for r in routed:
        e = exp[r["doc_id"]]
        assert list(r["tokens"]) == e["tokens"], r["doc_id"]
        assert r["n_tok"] == len(e["tokens"]) == len(r["tokens"])
        assert r["family"] == e["family"], r["doc_id"]


def test_rule_histogram_equals_oracle(spark, pipeline_out, oracle_events):
    out, _ = pipeline_out
    routed = read_sink(spark, f"{out}/sinks")
    got = {(r["family"], r["rule_id"]): r["cnt"] for r in rule_histogram(routed).collect()}
    want = Counter((e["family"], e["rule_id"]) for e in oracle_events)
    assert got == dict(want)


def test_source_level_rollup_equals_oracle(spark, pipeline_out, oracle_events):
    out, _ = pipeline_out
    routed = read_sink(spark, f"{out}/sinks")
    got = {(r["source"], r["level"]): r["cnt"] for r in source_level_rollup(routed).collect()}
    want = Counter()
    for e in oracle_events:
        want[(e["source"], e["level"])] += 1
        want[(e["source"], None)] += 1
        want[(None, None)] += 1
    assert got == dict(want)


def test_enrichment_present(spark, pipeline_out):
    out, _ = pipeline_out
    routed = read_sink(spark, f"{out}/sinks")
    assert routed.where(F.col("datacenter").isNull()).count() == 0
    assert routed.where(F.col("event_category").isNull()).count() == 0
    unk = routed.where(F.col("family") == "unknown")
    assert unk.count() > 0
    assert unk.where(F.col("event_type") != "unknown").count() == 0


def test_fields_map_matches_oracle(spark, pipeline_out, oracle_events):
    out, _ = pipeline_out
    routed = read_sink(spark, f"{out}/sinks").select("doc_id", "fields").collect()
    exp = {e["doc_id"]: e["fields"] for e in oracle_events}
    for r in routed:
        assert (r["fields"] or {}) == exp[r["doc_id"]], r["doc_id"]


def test_compact_sinks_preserves_rows_and_reduces_files(spark, tmp_path):
    """compact_sinks must rewrite the (family, source, bucket) tree into
    fewer files without changing a single row — tokens bit-identical,
    partition dirs preserved, old tree gone."""
    import os

    from logparse_spark.operators.route import compact_sinks, read_sink

    from logparse_spark.engine import parse_sequences
    from logparse_spark.operators.enrich import enrich, rules_dim
    from logparse_spark.operators.route import route, with_bucket
    from logparse_spark.sources.datagen import nodes_dim

    seq = generate_sequences(spark, 2500, partitions=8)
    enriched = with_bucket(
        enrich(parse_sequences(with_bucket(seq, 2)), nodes_dim(spark), rules_dim(spark)), 2)
    sinks = str(tmp_path / "compact_sinks")
    # salt=3: the multi-writer tree a hot-dir layout (or N incremental
    # ingests) leaves behind — the thing compaction exists to fix
    route(enriched, sinks, n_buckets=2, write_salt=3)
    before = {
        r["doc_id"]: r["tokens"]
        for r in read_sink(spark, sinks).select("doc_id", "tokens").collect()
    }
    stats = compact_sinks(spark, sinks, write_salt=1)
    assert stats["rows"] == len(before) == 2500
    assert stats["files_after"] < stats["files_before"]
    after_df = read_sink(spark, sinks)
    after = {r["doc_id"]: r["tokens"]
             for r in after_df.select("doc_id", "tokens").collect()}
    assert after == before  # bit-identical tokens, no row lost or duped
    # partition tree shape preserved (family dirs still prunable)
    fams = {d for d in os.listdir(sinks) if d.startswith("family=")}
    assert "family=unknown" in fams and len(fams) > 3
    assert not os.path.exists(sinks + "__compacting")
    assert not os.path.exists(sinks + "__precompact")


def test_route_rebalance_mode_bytes_proportional(spark, tmp_path):
    """cluster='rebalance': AQE runtime stats size files-per-dir by each
    dir's bytes — hot dirs split past the advisory size, the cold tail
    packs several dirs per task but still writes one file per dir — and
    every row/token survives bit-identically (the binding invariant)."""
    import os
    from collections import Counter as C

    from logparse_spark.engine import parse_sequences
    from logparse_spark.operators.enrich import enrich, rules_dim
    from logparse_spark.operators.route import read_sink, route, with_bucket
    from logparse_spark.sources.datagen import nodes_dim

    seq = generate_sequences(spark, 2500, partitions=8)
    enriched = with_bucket(
        enrich(parse_sequences(with_bucket(seq, 2)), nodes_dim(spark), rules_dim(spark)), 2)
    sinks = str(tmp_path / "rebalance_sinks")
    adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    old = spark.conf.get(adv)
    spark.conf.set(adv, "64k")  # tiny advisory -> hot dirs must split
    try:
        route(enriched, sinks, n_buckets=2, cluster="rebalance")
    finally:
        spark.conf.set(adv, old)
    before = {r["doc_id"]: r["tokens"]
              for r in enriched.select("doc_id", "tokens").collect()}
    after = {r["doc_id"]: r["tokens"]
             for r in read_sink(spark, sinks).select("doc_id", "tokens").collect()}
    assert after == before  # no row dropped/duped, tokens bit-identical
    per_dir = C()
    for root, _, files in os.walk(sinks):
        for f in files:
            if f.endswith(".parquet"):
                per_dir[root] += 1
    # the zipf-hot slots exceeded 64k and were split by AQE...
    assert max(per_dir.values()) > 1, dict(per_dir)
    # ...while fully-cold slots coalesce to one file per dir
    assert min(per_dir.values()) == 1
    # files-per-dir is bounded by its slot's split count (a cold dir
    # co-hashed with a hot one pays one file per slice), never by the
    # task count: the total stays a small multiple of the dir count,
    # not O(tasks x dirs)
    assert sum(per_dir.values()) < 3 * len(per_dir), sum(per_dir.values())
    assert max(per_dir.values()) <= 8, dict(per_dir)


def test_route_clustering_mode_selection():
    """Scale-adaptivity contract: measured-small inputs keep the pinned
    salt (one file per dir, parallel write); measured-big inputs take
    AQE rebalance (bytes-proportional files); unknown size fails toward
    the protective salt, never toward a serialized tiny rebalance;
    pre-clustered inputs skip the shuffle entirely."""
    from logparse_spark.main import _route_clustering

    assert _route_clustering(215 << 20, False) == (1, True)
    assert _route_clustering(2 << 30, False) == (1, "rebalance")
    assert _route_clustering(0, False) == (2, True)
    assert _route_clustering(2 << 30, True)[1] is False


def test_narrow_fresh_run_metrics_from_sink_readback(spark, tmp_path):
    """r7: a FRESH narrow-mode run derives the metric tables from a
    column-pruned read-back of the just-written sinks (no second parse
    pass).  Every metric output must equal the full-cache mode's on the
    same corpus."""
    seq = generate_sequences(spark, 1200, partitions=4)
    out_a = str(tmp_path / "narrow")
    out_b = str(tmp_path / "full")
    m_a = run_pipeline(spark, seq, out_a, n_buckets=2, resume=False,
                       cache_mode="narrow")
    m_b = run_pipeline(spark, seq, out_b, n_buckets=2, resume=False,
                       cache_mode="full")
    for k in ("routed_rows", "total_tokens", "unknown_rows", "families"):
        assert m_a[k] == m_b[k]
    for tbl in ("rule_histogram", "source_level_rollup", "family_metrics"):
        # rollup rows contain NULL grouping cells -> sort None-safe
        a = sorted(map(tuple, spark.read.parquet(f"{out_a}/metrics/{tbl}").collect()), key=repr)
        b = sorted(map(tuple, spark.read.parquet(f"{out_b}/metrics/{tbl}").collect()), key=repr)
        assert a == b, f"{tbl} diverged between sink read-back and full cache"
    # the ledger must commit the same (source, bucket, rows) rows
    a = sorted(map(tuple, spark.read.parquet(f"{out_a}/ledger").select(
        "source", "bucket", "rows").collect()))
    b = sorted(map(tuple, spark.read.parquet(f"{out_b}/ledger").select(
        "source", "bucket", "rows").collect()))
    assert a == b
