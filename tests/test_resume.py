"""P9 resume: kill after K partitions, re-run, outputs identical to an
uninterrupted run; re-running a completed pipeline is a no-op."""

from logparse_spark.ledger import Ledger
from logparse_spark.main import run_pipeline
from logparse_spark.operators.route import read_sink, with_bucket
from logparse_spark.sources.datagen import generate_sequences

N = 2000


def _fingerprint(spark, out):
    df = read_sink(spark, f"{out}/sinks").select("doc_id", "rule_id", "family", "n_tok")
    return sorted(map(tuple, df.collect()))


def test_resume_after_partial_failure(spark, tmp_path):
    out_full = str(tmp_path / "full")
    out_resumed = str(tmp_path / "resumed")
    seq = generate_sequences(spark, N, partitions=4)

    run_pipeline(spark, seq, out_full, n_buckets=2)

    # crash after only 5 partitions committed...
    run_pipeline(spark, seq, out_resumed, n_buckets=2, fail_after_partitions=5)
    ledger = Ledger(spark, f"{out_resumed}/ledger")
    done_before = ledger.done().count()
    assert done_before == 5
    # ...then resume: only pending partitions re-run
    run_pipeline(spark, seq, out_resumed, n_buckets=2)

    assert _fingerprint(spark, out_resumed) == _fingerprint(spark, out_full)


def test_rerun_completed_is_noop(spark, tmp_path):
    out = str(tmp_path / "noop")
    seq = generate_sequences(spark, N, partitions=4)
    run_pipeline(spark, seq, out, n_buckets=2)
    fp1 = _fingerprint(spark, out)
    metrics2 = run_pipeline(spark, seq, out, n_buckets=2)
    assert metrics2["routed_rows"] == 0  # nothing pending
    assert _fingerprint(spark, out) == fp1


def test_pending_partitions_anti_join(spark, tmp_path):
    out = str(tmp_path / "pending")
    seq = with_bucket(generate_sequences(spark, 500, partitions=2), 2)
    ledger = Ledger(spark, f"{out}/ledger")
    all_parts = seq.select("source", "bucket").distinct()
    assert ledger.pending(seq).count() == all_parts.count()
    ledger.commit(all_parts.limit(3).selectExpr("source", "bucket", "1 as rows"), "run0")
    assert ledger.pending(seq).count() == all_parts.count() - 3


def test_overwrite_mode_split_fresh_static_resume_dynamic(spark, tmp_path, monkeypatch):
    # VERDICT r5 #6: fresh full runs (resume=False) must take the cheap
    # static-overwrite commit; resume runs must keep dynamic (partial
    # idempotent partition rewrite).  Spy on route() to pin which mode
    # each path requests AND check the session conf route() actually set.
    import logparse_spark.main as mainmod
    from logparse_spark.operators import route as routemod

    seen = []
    real_route = routemod.route

    def spy(df, sinks_path, **kw):
        seen.append(kw.get("overwrite_mode"))
        return real_route(df, sinks_path, **kw)

    monkeypatch.setattr(mainmod, "route", spy)
    seq = generate_sequences(spark, 300, partitions=2)
    run_pipeline(spark, seq, str(tmp_path / "fresh"), n_buckets=2, resume=False)
    assert seen == ["static"]
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower() == "static"
    run_pipeline(spark, seq, str(tmp_path / "res"), n_buckets=2, resume=True)
    assert seen == ["static", "dynamic"]
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower() == "dynamic"


def test_auto_n_buckets_resolution(spark, tmp_path):
    # r6: n_buckets=None resolves by input bytes, persists per output
    # dir, and ALWAYS reuses the persisted value (ledger-key stability)
    from logparse_spark.main import resolve_n_buckets

    out = str(tmp_path / "auto")
    assert resolve_n_buckets(1 << 20, out) == 1          # tiny input
    assert resolve_n_buckets(100 << 40, out) == 1        # reused, not 1024
    out2 = str(tmp_path / "auto2")
    assert resolve_n_buckets(100 << 40, out2) == 1024    # 100 TB -> cap
    out3 = str(tmp_path / "auto3")
    assert resolve_n_buckets(3 << 30, out3) == 8         # 3 GB -> 6x512MB -> 8
    out4 = str(tmp_path / "auto4")
    assert resolve_n_buckets(0, out4) == 4               # unknown: protective

    # end-to-end: an auto run on a tiny parquet input resolves to 1
    # bucket, persists it, and a resume into the same out dir reuses it
    src = str(tmp_path / "seq_src")
    generate_sequences(spark, 300, partitions=2).write.parquet(src)
    seq = spark.read.parquet(src)
    out5 = str(tmp_path / "auto_run")
    run_pipeline(spark, seq, out5, n_buckets=None, resume=True)
    import json as _json
    with open(f"{out5}/ledger/_meta.json") as f:
        assert _json.load(f)["n_buckets"] == 1
    m2 = run_pipeline(spark, seq, out5, n_buckets=None, resume=True)
    assert m2["routed_rows"] == 0  # ledger keys consistent -> no-op


def test_explicit_n_buckets_conflict_with_persisted_meta_raises(spark, tmp_path):
    """ADVICE r6: an explicit n_buckets contradicting the count persisted
    in <out>/ledger/_meta.json must refuse loudly (mismatched resume key
    spaces duplicate or skip partitions)."""
    import pytest as _pytest

    from logparse_spark.main import run_pipeline
    from logparse_spark.sources.datagen import generate_sequences

    import json as _json
    import os as _os

    out = str(tmp_path / "o")
    seq = generate_sequences(spark, 300, partitions=2)
    run_pipeline(spark, seq, out, n_buckets=None, resume=False)  # persists meta
    with open(_os.path.join(out, "ledger", "_meta.json")) as f:
        persisted = int(_json.load(f)["n_buckets"])
    with _pytest.raises(ValueError, match="conflicts with the bucket count"):
        run_pipeline(spark, seq, out, n_buckets=persisted + 1, resume=True)
    # same explicit value as persisted: fine
    run_pipeline(spark, seq, out, n_buckets=persisted, resume=True)
