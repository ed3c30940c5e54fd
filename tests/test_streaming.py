"""M4: streaming tail — availableNow replay equals batch replay; kill/restart
from checkpoint reconverges; re-running a finished stream is a no-op;
streaming dedup drops duplicate deliveries."""

import os

from pyspark.sql import functions as F

from rap_etl_spark.engine import assert_equivalent
from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.synth import synthesize_events, write_event_log
from rap_etl_spark.streaming.tail import (
    latest_checkpointed_batch,
    replay_stream,
    stream_dedup,
    stream_tail,
)

from .oracle import assert_frames_equal, naive_final_state

N_EVENTS = 3000


def _mk_log(spark, sf_small, tmp_path, n_batches=5):
    ev = synthesize_events(spark, sf_small, N_EVENTS, max_tok=8)
    write_event_log(ev, str(tmp_path / "log"), n_batches=n_batches, n_events=N_EVENTS)
    return str(tmp_path / "log")


def test_stream_replay_matches_oracle(spark, sf_small, tmp_path):
    log = _mk_log(spark, sf_small, tmp_path)
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    replay_stream(
        spark, log, str(tmp_path / "cp"), t, max_files_per_trigger=16
    )
    want = naive_final_state(spark.read.parquet(log).toPandas())
    assert_frames_equal(t.read().toPandas(), want)
    assert latest_checkpointed_batch(str(tmp_path / "cp")) is not None


def test_stream_resume_from_checkpoint(spark, sf_small, tmp_path):
    """Process half the backlog, 'crash', restart from the checkpoint with
    the full backlog present — final state must equal a clean full replay."""
    log = _mk_log(spark, sf_small, tmp_path)
    half = str(tmp_path / "log_half")
    os.makedirs(half)
    for b in range(3):
        os.symlink(f"{log}/batch={b}", f"{half}/batch={b}")
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    cp = str(tmp_path / "cp")
    replay_stream(spark, half, cp, t, max_files_per_trigger=8)
    mid_batches = latest_checkpointed_batch(cp)
    # "restart": same checkpoint, now the full log is visible
    for b in range(3, 5):
        os.symlink(f"{log}/batch={b}", f"{half}/batch={b}")
    replay_stream(spark, half, cp, t, max_files_per_trigger=8)
    assert latest_checkpointed_batch(cp) > mid_batches
    want = naive_final_state(spark.read.parquet(log).toPandas())
    assert_frames_equal(t.read().toPandas(), want)
    # third run with nothing new: no-op, state unchanged
    sid = t.snapshot_id()
    replay_stream(spark, half, cp, t, max_files_per_trigger=8)
    assert t.snapshot_id() == sid


def test_stream_and_batch_agree(spark, sf_small, tmp_path):
    log = _mk_log(spark, sf_small, tmp_path)
    t_s = ManifestParquetTable.create(spark, str(tmp_path / "s"), DOCS_SCHEMA, n_buckets=8)
    replay_stream(spark, log, str(tmp_path / "cp"), t_s, max_files_per_trigger=12)
    from rap_etl_spark.engine import replay_log

    t_b = ManifestParquetTable.create(spark, str(tmp_path / "b"), DOCS_SCHEMA, n_buckets=8)
    replay_log(spark, t_b, log)
    assert_equivalent(t_s.read(), t_b.read())


def test_stream_dedup_within_watermark(spark, sf_small, tmp_path):
    log = _mk_log(spark, sf_small, tmp_path)
    src = spark.readStream.schema(
        spark.read.parquet(log).drop("batch").schema
    ).parquet(log)
    deduped = stream_dedup(src, delay="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select count(*) c from dedup_out").first()["c"]
    distinct = spark.read.parquet(log).dropDuplicates(["doc_id", "lsn"]).count()
    assert got == distinct


def test_stream_static_enrich(spark, sf_small, tmp_path):
    """R9: stream-static broadcast join enriches every micro-batch; result
    equals the batch join of the same frames."""
    from rap_etl_spark.streaming.tail import stream_static_enrich

    log = _mk_log(spark, sf_small, tmp_path)
    batch_ev = spark.read.parquet(log).drop("batch")
    dim = batch_ev.select("source").distinct().withColumn(
        "tier", F.when(F.length("source") > 4, "long").otherwise("short")
    )
    src = spark.readStream.schema(batch_ev.schema).parquet(log)
    q = (
        stream_static_enrich(src, dim)
        .writeStream.format("memory")
        .queryName("enrich_out")
        .option("checkpointLocation", str(tmp_path / "cp_en"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "select tier, count(*) c from enrich_out group by tier order by tier"
    ).collect()
    want = (
        stream_static_enrich(batch_ev, dim)
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("tier")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert sum(r["c"] for r in got) == batch_ev.count()  # left join keeps all


def test_stream_stream_join(spark, sf_small, tmp_path):
    """R10: watermarked stream-stream self-join within a time range matches
    the identical batch join (nothing is late under a generous watermark)."""
    from rap_etl_spark.streaming.tail import stream_stream_join

    log = _mk_log(spark, sf_small, tmp_path, n_batches=2)
    batch_ev = spark.read.parquet(log).drop("batch")
    schema = batch_ev.schema
    l_src = spark.readStream.schema(schema).parquet(log)
    r_src = spark.readStream.schema(schema).parquet(log)
    q = (
        stream_stream_join(l_src, r_src, window="1 hour")
        .selectExpr("doc_id", "lsn", "r_lsn")
        .writeStream.format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "cp_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select count(*) c from ssj_out").first()["c"]
    want = stream_stream_join(batch_ev, batch_ev, window="1 hour").count()
    assert got == want and got > 0


def test_stream_packed_wal_tail(spark, sf_small, tmp_path):
    """C8 over the packed wire format: a streaming tail of EVENTS_SCHEMA_PACKED
    files converges to the same final state as the array-format batch replay
    of the same events (engine expands winners at merge time)."""
    from rap_etl_spark.schemas import EVENTS_SCHEMA_PACKED

    packed = synthesize_events(spark, sf_small, N_EVENTS, max_tok=8, packed=True)
    write_event_log(packed, str(tmp_path / "plog"), n_batches=4, n_events=N_EVENTS)
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "tp"), DOCS_SCHEMA, n_buckets=8
    )
    replay_stream(
        spark,
        str(tmp_path / "plog"),
        str(tmp_path / "pcp"),
        t,
        schema=EVENTS_SCHEMA_PACKED,
        max_files_per_trigger=16,
    )
    arr = synthesize_events(spark, sf_small, N_EVENTS, max_tok=8)
    want = naive_final_state(arr.toPandas())
    assert_frames_equal(t.read().toPandas(), want)


def test_stream_prunes_ledger_at_checkpoint_horizon(spark, sf_small, tmp_path):
    """prune_ledger_every keeps commit metadata O(window) during a long
    tail: after the run the per-batch ledger holds only entries above the
    horizon, yet every processed batch still answers is_committed (the
    exactly-once guarantee is preserved through the horizon marker)."""
    log = _mk_log(spark, sf_small, tmp_path, n_batches=5)
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    q = stream_tail(
        spark, log, str(tmp_path / "cp"), t,
        max_files_per_trigger=16, prune_ledger_every=2,
    )
    q.awaitTermination()
    n_batches = latest_checkpointed_batch(str(tmp_path / "cp")) + 1
    assert n_batches >= 3
    assert t.ledger_horizon() is not None
    assert len(t.committed_batches()) < n_batches
    for b in range(n_batches):
        assert t.is_committed(b)
    # state still equals the oracle
    want = naive_final_state(spark.read.parquet(log).toPandas())
    assert_frames_equal(t.read().toPandas(), want)
