"""X91 topic log compaction: winner-only retention with offset preservation.

The contract under test (sources/topic.py compact_topic):
- after compaction a batch read returns EXACTLY the latest record per key
  (tombstones kept by default, dropped with drop_tombstones=True);
- the per-partition segment COUNT — the stream-offset unit — is unchanged,
  with superseded prefix segments becoming valid empty segments;
- a consumer resuming from a checkpoint taken before compaction converges
  to the same table state (re-delivered winners collapse via LWW/ledger);
- bytes shrink, rows never invent: compaction only removes superseded
  records.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rap_etl_spark.sources.binlog import _list_segments
from rap_etl_spark.sources.topic import (
    compact_topic,
    register,
    write_topic,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "op string, doc_id string, lsn long, tokens array<int>, source string"
    )


def _mk_topic(spark, path, n_partitions=3):
    """Three producer calls -> three segments per touched partition; keys
    k0..k9 get multiple versions, k3/k7 end tombstoned."""
    register(spark)
    v1 = [("I", f"k{i}", i, [i], "s0") for i in range(10)]
    v2 = [("U", f"k{i}", 100 + i, [i, i], "s1") for i in range(0, 10, 2)]
    v3 = [("D", f"k{i}", 200 + i, [], "s2") for i in (3, 7)]
    for batch in (v1, v2, v3):
        write_topic(_ev(spark, batch), path, n_partitions=n_partitions)
    return path


def _read_all(spark, path):
    return (
        spark.read.format("rap-etl-topic").option("path", path).load()
    )


def _expected_winners():
    out = {}
    for i in range(10):
        out[f"k{i}"] = ("I", i)
    for i in range(0, 10, 2):
        out[f"k{i}"] = ("U", 100 + i)
    for i in (3, 7):
        out[f"k{i}"] = ("D", 200 + i)
    return out


def test_compaction_keeps_latest_per_key(spark, tmp_path):
    topic = _mk_topic(spark, str(tmp_path / "t"))
    pre_segs = {
        p: _list_segments(str(tmp_path / "t" / f"p={p}")) for p in range(3)
    }
    pre_bytes = sum(
        os.path.getsize(s) for segs in pre_segs.values() for s in segs
    )
    stats = compact_topic(spark, topic)
    got = {
        r["doc_id"]: (r["op"], r["lsn"]) for r in _read_all(spark, topic).collect()
    }
    assert got == _expected_winners()
    # offset unit preserved: same segment names, same count per partition
    for p, segs in pre_segs.items():
        assert _list_segments(str(tmp_path / "t" / f"p={p}")) == segs
    post_bytes = sum(
        os.path.getsize(s) for segs in pre_segs.values() for s in segs
    )
    assert post_bytes < pre_bytes
    assert sum(s["rows_after"] for s in stats.values()) == 10


def test_drop_tombstones(spark, tmp_path):
    topic = _mk_topic(spark, str(tmp_path / "t"))
    compact_topic(spark, topic, drop_tombstones=True)
    got = {r["doc_id"] for r in _read_all(spark, topic).collect()}
    assert got == {f"k{i}" for i in range(10)} - {"k3", "k7"}


def test_compaction_is_idempotent(spark, tmp_path):
    topic = _mk_topic(spark, str(tmp_path / "t"))
    compact_topic(spark, topic)
    before = sorted(
        (r["doc_id"], r["lsn"]) for r in _read_all(spark, topic).collect()
    )
    compact_topic(spark, topic)  # compacting a compacted topic: no-op state
    after = sorted(
        (r["doc_id"], r["lsn"]) for r in _read_all(spark, topic).collect()
    )
    assert before == after


def test_consumer_resumes_across_compaction(spark, tmp_path):
    """Checkpoint taken BEFORE compaction, resume AFTER: the vector offset
    stays valid (segment counts unchanged) and redelivered winners
    collapse — final table state equals the no-compaction replay."""
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.schemas import DOCS_SCHEMA
    from rap_etl_spark.streaming.tail import stream_tail

    topic = _mk_topic(spark, str(tmp_path / "t"))
    table = ManifestParquetTable.create(
        spark, str(tmp_path / "tbl"), DOCS_SCHEMA, n_buckets=4
    )
    cp = str(tmp_path / "cp")
    q = stream_tail(
        spark, topic, cp, table, source="topic", available_now=True
    )
    q.awaitTermination()
    state1 = {r["doc_id"]: r["n_tok"] for r in table.read().collect()}

    compact_topic(spark, topic)
    # post-compaction produce: a late update to k1 and a brand-new key
    write_topic(
        _ev(spark, [("U", "k1", 300, [9, 9, 9], "s3"), ("I", "k10", 301, [1], "s3")]),
        topic,
        n_partitions=3,
    )
    q2 = stream_tail(
        spark, topic, cp, table, source="topic", available_now=True
    )
    q2.awaitTermination()
    state2 = {r["doc_id"]: r["n_tok"] for r in table.read().collect()}
    expect = dict(state1)
    expect["k1"] = 3
    expect["k10"] = 1
    assert state2 == expect


def test_fresh_consumer_of_compacted_equals_lww(spark, tmp_path):
    """Bootstrap-from-compacted-topic: a brand-new consumer of the
    compacted topic converges to the same table state as one that read
    the full history."""
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.schemas import DOCS_SCHEMA
    from rap_etl_spark.streaming.tail import stream_tail

    full = _mk_topic(spark, str(tmp_path / "full"))
    comp = _mk_topic(spark, str(tmp_path / "comp"))
    compact_topic(spark, comp)
    states = []
    for name, topic in (("a", full), ("b", comp)):
        table = ManifestParquetTable.create(
            spark, str(tmp_path / f"tbl-{name}"), DOCS_SCHEMA, n_buckets=4
        )
        q = stream_tail(
            spark,
            topic,
            str(tmp_path / f"cp-{name}"),
            table,
            source="topic",
            available_now=True,
        )
        q.awaitTermination()
        states.append(
            sorted(
                (r["doc_id"], r["n_tok"], tuple(r["tokens"] or []))
                for r in table.read().collect()
            )
        )
    assert states[0] == states[1]


def test_compact_empty_and_missing_topic(spark, tmp_path):
    assert compact_topic(spark, str(tmp_path / "nope")) == {}
    os.makedirs(str(tmp_path / "e" / "p=0"))
    assert compact_topic(spark, str(tmp_path / "e")) == {}


def test_cli_compact_topic(spark, tmp_path):
    from rap_etl_spark import cli

    topic = _mk_topic(spark, str(tmp_path / "t"))
    rc = cli.main(["compact-topic", "--topic", topic])
    assert rc == 0
    got = {r["doc_id"]: r["lsn"] for r in _read_all(spark, topic).collect()}
    assert got == {k: lsn for k, (_op, lsn) in _expected_winners().items()}
