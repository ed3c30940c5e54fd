"""Crash atomicity: a failure between writing data files and swapping the
manifest pointer must leave readers on the old snapshot (orphaned data
files, no state change), and a simple retry of the same batch must
converge — the fallback backend's equivalent of Iceberg's atomic commit
(SURVEY.md §7.4-1)."""

import pytest
from pyspark.sql import functions as F

from rap_etl_spark.engine import CdcEngine
from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.synth import synthesize_events, write_event_log

from .oracle import assert_frames_equal, naive_final_state

N_EVENTS = 2000


@pytest.fixture()
def log_and_table(spark, sf_small, tmp_path):
    ev = synthesize_events(spark, sf_small, N_EVENTS, max_tok=8)
    write_event_log(ev, str(tmp_path / "log"), n_batches=2, n_events=N_EVENTS)
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    return str(tmp_path / "log"), t


def test_crash_before_manifest_swap_is_invisible(spark, log_and_table, tmp_path):
    log, t = log_and_table
    engine = CdcEngine(spark, t)
    engine.apply_batch(spark.read.parquet(f"{log}/batch=0"), batch_id=0)
    snap_before = t.snapshot_id()
    rows_before = t.read().orderBy("doc_id").collect()

    real_write = t._write_manifest

    def crash(_manifest):
        raise RuntimeError("simulated crash before manifest pointer swap")

    t._write_manifest = crash
    with pytest.raises(RuntimeError, match="simulated crash"):
        engine.apply_batch(spark.read.parquet(f"{log}/batch=1"), batch_id=1)
    t._write_manifest = real_write

    # reader-visible state is untouched: same snapshot, same rows, batch 1
    # not in the ledger (orphaned data files exist but no manifest points
    # at them — exactly Iceberg's failed-commit debris, GC'd by
    # expire_snapshots/compact)
    t.refresh()
    assert t.snapshot_id() == snap_before
    assert "1" not in t.committed_batches()
    assert t.read().orderBy("doc_id").collect() == rows_before

    # plain retry converges to the oracle state
    m = engine.apply_batch(spark.read.parquet(f"{log}/batch=1"), batch_id=1)
    assert not m.skipped
    both = spark.read.parquet(log)
    want = naive_final_state(both.toPandas())
    assert_frames_equal(t.read().toPandas(), want)


def test_crash_during_lineage_write_then_retry(spark, log_and_table, tmp_path):
    """Lineage is written after the table commit; a crash there must not
    corrupt the table, and the retried batch is a metadata no-op that
    rewrites (not duplicates) its lineage partition."""
    log, t = log_and_table
    lineage = str(tmp_path / "lineage")
    engine = CdcEngine(spark, t, lineage_dir=lineage)
    engine.apply_batch(spark.read.parquet(f"{log}/batch=0"), batch_id=0)

    real = engine._write_lineage
    calls = {"n": 0}

    def crash(events, batch_id, info):
        calls["n"] += 1
        raise RuntimeError("simulated crash during lineage write")

    engine._write_lineage = crash
    with pytest.raises(RuntimeError, match="lineage"):
        engine.apply_batch(spark.read.parquet(f"{log}/batch=1"), batch_id=1)
    engine._write_lineage = real
    assert calls["n"] == 1
    # table committed batch 1 before the lineage crash
    assert "1" in t.committed_batches()

    # retry: table-side no-op (already committed)
    m = engine.apply_batch(spark.read.parquet(f"{log}/batch=1"), batch_id=1)
    assert m.skipped
    # lineage for batch 0 intact
    l0 = spark.read.parquet(f"{lineage}/batch=0")
    assert l0.agg(F.sum("rows_applied")).first()[0] > 0


def test_concurrent_commit_conflict_detected(spark, tmp_path):
    """Optimistic concurrency: a writer whose base snapshot went stale
    (another writer committed in between) must get CommitConflictError and
    succeed after refresh — never silently clobber the other commit."""
    from rap_etl_spark.lake import CommitConflictError

    t_path = str(tmp_path / "occ")
    a = ManifestParquetTable.create(spark, t_path, DOCS_SCHEMA, n_buckets=4)
    b = ManifestParquetTable(spark, t_path)
    ch = spark.createDataFrame(
        [("doc-1", "I", 1, [1], 1, "s")],
        "doc_id string, op string, lsn long, tokens array<int>, n_tok int, source string",
    )
    ch2 = spark.createDataFrame(
        [("doc-2", "I", 2, [2], 1, "s")],
        "doc_id string, op string, lsn long, tokens array<int>, n_tok int, source string",
    )
    b.schema()  # populate b's cache at the initial snapshot
    a.merge(ch, batch_id=0)  # a commits first

    with pytest.raises(CommitConflictError):
        b.merge(ch2, batch_id=1)  # b's base is stale

    b.refresh()
    b.merge(ch2, batch_id=1)  # retry on the fresh base succeeds
    a.refresh()
    keys = sorted(r["doc_id"] for r in a.read().select("doc_id").collect())
    assert keys == ["doc-1", "doc-2"]  # neither commit was lost
