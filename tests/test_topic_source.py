"""Partitioned WAL topic source (sources/topic.py): stable key routing,
one-job produce with per-partition ordered publish, batch read, vector-
offset streaming with a total rate cap, mid-stream partition discovery,
checkpoint resume."""

import os

import pytest
from pyspark.sql import functions as F

from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.synth import synthesize_events
from rap_etl_spark.sources.topic import (
    TopicStreamReader,
    _list_segments,
    _part_dirs,
    register,
    write_topic,
)


def _events(spark, sf_small, n=2000):
    return synthesize_events(spark, sf_small, n, max_tok=8).select(
        "op", "doc_id", "lsn", "tokens", "source"
    )


def _canon(df):
    return sorted(
        (r["op"], r["doc_id"], r["lsn"], tuple(r["tokens"] or []), r["source"])
        for r in df.collect()
    )


def test_topic_roundtrip_and_stable_routing(spark, sf_small, tmp_path):
    """Batch read returns exactly the produced rows, and every key's rows
    land in ONE partition (per-key order survives the fan-out)."""
    ev = _events(spark, sf_small)
    topic = str(tmp_path / "topic")
    pub = write_topic(ev, topic, n_partitions=4)
    assert sum(pub.values()) >= 1 and set(pub) <= {0, 1, 2, 3}
    register(spark)
    from rap_etl_spark.sources.binlog import register as register_binlog

    register_binlog(spark)  # used below to read one partition dir directly
    got = spark.read.format("rap-etl-topic").option("path", topic).load()
    assert _canon(got) == _canon(ev)
    # stable routing: no doc_id appears in two partition dirs
    seen: dict[str, int] = {}
    for pid, d in _part_dirs(topic):
        for s in _list_segments(d):
            for r in (
                spark.read.format("rap-etl-binlog")
                .option("path", d)
                .load()
                .select("doc_id")
                .distinct()
                .collect()
            ):
                assert seen.setdefault(r["doc_id"], pid) == pid
            break  # one segment per dir in this produce


def test_topic_produce_appends(spark, sf_small, tmp_path):
    """Repeated write_topic calls append segments with contiguous
    numbering per partition — the producer loop."""
    ev = _events(spark, sf_small, n=800)
    topic = str(tmp_path / "topic")
    write_topic(ev, topic, n_partitions=2)
    write_topic(ev, topic, n_partitions=2)
    register(spark)
    for _pid, d in _part_dirs(topic):
        segs = _list_segments(d)
        assert [os.path.basename(s) for s in segs] == [
            f"segment-{i:06d}.rapwal" for i in range(len(segs))
        ]
        assert len(segs) == 2
    got = spark.read.format("rap-etl-topic").option("path", topic).load()
    assert got.count() == 2 * ev.count()


def test_topic_stream_to_table_converges(spark, sf_small, tmp_path):
    """readStream over the topic -> foreachBatch engine apply converges to
    the batch replay of the same events, exactly-once through the
    checkpoint: a second run from the same checkpoint applies nothing."""
    from rap_etl_spark.engine import CdcEngine, assert_equivalent

    ev = _events(spark, sf_small)
    topic = str(tmp_path / "topic")
    write_topic(ev, topic, n_partitions=4)
    register(spark)

    t_stream = ManifestParquetTable.create(
        spark, str(tmp_path / "ts"), DOCS_SCHEMA, n_buckets=8
    )
    engine = CdcEngine(spark, t_stream)

    def apply(batch_df, batch_id):
        enriched = batch_df.withColumn("n_tok", F.size("tokens")).withColumn(
            "ingest_ts", F.current_timestamp()
        )
        engine.apply_batch(enriched, batch_id=batch_id)

    def run():
        q = (
            spark.readStream.format("rap-etl-topic")
            .option("path", topic)
            .load()
            .writeStream.foreachBatch(apply)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    snap = t_stream.snapshot_id()
    run()  # no new segments: no new micro-batch commits
    assert t_stream.snapshot_id() == snap

    t_batch = ManifestParquetTable.create(
        spark, str(tmp_path / "tb"), DOCS_SCHEMA, n_buckets=8
    )
    CdcEngine(spark, t_batch).apply_batch(
        ev.withColumn("n_tok", F.size("tokens")).withColumn(
            "ingest_ts", F.current_timestamp()
        ),
        batch_id=0,
    )
    assert_equivalent(t_stream.read(), t_batch.read())


def test_topic_stream_resumes_and_discovers_new_partitions(
    spark, sf_small, tmp_path
):
    """After a checkpointed run, newly produced segments AND a brand-new
    partition dir are picked up from the vector offset; already-consumed
    segments are not re-read."""
    ev = _events(spark, sf_small, n=1000)
    topic = str(tmp_path / "topic")
    write_topic(ev.filter(F.col("lsn") % 2 == 0), topic, n_partitions=2)
    register(spark)
    out = str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("rap-etl-topic")
            .option("path", topic)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    n1 = spark.read.parquet(out).count()
    # widen the topic: routing at 4 partitions creates p=2 / p=3 dirs
    write_topic(ev.filter(F.col("lsn") % 2 == 1), topic, n_partitions=4)
    run()
    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # nothing re-read, nothing lost
    assert n1 == ev.filter(F.col("lsn") % 2 == 0).count()
    assert {pid for pid, _ in _part_dirs(topic)} >= {0, 1}


def test_topic_rate_cap_is_total_and_round_robin():
    """latestOffset advances at most maxSegmentsPerTrigger segments in
    TOTAL, one per partition round-robin — a hot partition cannot starve
    the others."""
    reader = TopicStreamReader.__new__(TopicStreamReader)
    reader.path = "/nonexistent"
    reader.max_per_trigger = 3
    reader._last_end = {"0": 0, "1": 0, "2": 0}
    avail = {"0": 5, "1": 1, "2": 2}

    # monkey-patch the listing: simulate 3 partitions with skewed backlogs
    import rap_etl_spark.sources.topic as topic_mod

    orig_pd, orig_ls = topic_mod._part_dirs, topic_mod._list_segments
    topic_mod._part_dirs = lambda p: [(int(k), k) for k in sorted(avail)]
    topic_mod._list_segments = lambda d: ["s"] * avail[d]
    try:
        end = reader.latestOffset()["p"]
        assert sum(end.values()) == 3
        assert end == {"0": 1, "1": 1, "2": 1}  # round-robin, not 3 from p0
        reader._last_end = end
        end2 = reader.latestOffset()["p"]
        assert sum(end2.values()) == 6
        assert end2 == {"0": 3, "1": 1, "2": 2}  # exhausted ones skipped
    finally:
        topic_mod._part_dirs, topic_mod._list_segments = orig_pd, orig_ls


def test_topic_writer_refuses_bad_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="wire columns"):
        write_topic(
            spark.range(3).withColumnRenamed("id", "x"),
            str(tmp_path / "t"),
            n_partitions=2,
        )


def test_cli_stream_topic_format(spark, sf_small, tmp_path, capsys):
    """Deployment surface: `stream --format topic` tails a partitioned
    topic into the table exactly-once."""
    import json as _json

    from rap_etl_spark.cli import main

    ev = _events(spark, sf_small, n=1500)
    topic = str(tmp_path / "topic")
    write_topic(ev, topic, n_partitions=3)
    table = str(tmp_path / "t")
    assert main(["init", "--table", table, "--buckets", "8"]) == 0
    assert (
        main(
            [
                "stream",
                "--table",
                table,
                "--log",
                topic,
                "--checkpoint",
                str(tmp_path / "cp"),
                "--format",
                "topic",
            ]
        )
        == 0
    )
    capsys.readouterr()
    t = ManifestParquetTable(spark, table)
    from rap_etl_spark.engine import CdcEngine, assert_equivalent

    ref = ManifestParquetTable.create(
        spark, str(tmp_path / "ref"), DOCS_SCHEMA, n_buckets=8
    )
    CdcEngine(spark, ref).apply_batch(
        ev.withColumn("n_tok", F.size("tokens")).withColumn(
            "ingest_ts", F.current_timestamp()
        ),
        batch_id=0,
    )
    assert_equivalent(t.read(), ref.read())


def test_cli_synth_topic_then_stream(spark, sf_small, tmp_path, capsys):
    """Full CLI loop with no Python API: synth --format topic produces a
    partitioned topic, stream --format topic consumes it."""
    import json as _json

    from rap_etl_spark.cli import main

    topic, table = str(tmp_path / "topic"), str(tmp_path / "t")
    assert (
        main(
            ["synth", "--out", topic, "--events", "1200", "--batches", "3",
             "--sf", sf_small, "--format", "topic"]
        )
        == 0
    )
    rec = [
        _json.loads(ln)
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    assert sum(rec["partitions"].values()) >= 1
    assert main(["init", "--table", table, "--buckets", "8"]) == 0
    assert (
        main(["stream", "--table", table, "--log", topic, "--checkpoint",
              str(tmp_path / "cp"), "--format", "topic"]) == 0
    )
    capsys.readouterr()
    t = ManifestParquetTable(spark, table)
    assert t.read().count() > 0
