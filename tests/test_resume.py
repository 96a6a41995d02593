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
