"""Custom binlog segment source (sources/binlog.py): encode/decode
roundtrip, batch DataSource read, streaming tail into the lake table."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.binlog import (
    decode_blocks,
    encode_block,
    register,
    write_binlog_segments,
    MAGIC,
)
from rap_etl_spark.sources.synth import synthesize_events


def _events(spark, sf_small, n=3000):
    return synthesize_events(spark, sf_small, n, max_tok=8).select(
        "op", "doc_id", "lsn", "tokens", "source"
    )


def test_encode_decode_roundtrip_unit():
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "op": ["I", "D", "U"],
            "doc_id": ["a", "bb", "ccc"],
            "lsn": [1, 2, 3],
            "tokens": [[1, 2, 3], None, []],
            "source": ["s0", None, "s2"],
        }
    )
    buf = MAGIC + encode_block(pdf) + encode_block(pdf)
    batches = decode_blocks(buf)
    assert len(batches) == 2
    t = pa.Table.from_batches(batches).to_pydict()
    assert t["doc_id"] == ["a", "bb", "ccc"] * 2
    assert t["lsn"] == [1, 2, 3] * 2
    assert t["tokens"][0] == [1, 2, 3]
    assert t["tokens"][1] == []  # deletes carry empty token lists
    assert t["op"] == ["I", "D", "U"] * 2
    assert t["source"] == ["s0", None, "s2"] * 2  # NULL survives the wire


def test_batch_source_roundtrip(spark, sf_small, tmp_path):
    ev = _events(spark, sf_small)
    n_written = write_binlog_segments(ev, str(tmp_path / "wal"), n_segments=4)
    assert n_written >= 1
    register(spark)
    got = (
        spark.read.format("rap-etl-binlog")
        .option("path", str(tmp_path / "wal"))
        .load()
    )
    assert got.count() == ev.count()
    # value-level: per-key max lsn and token sums agree with the source df
    def summ(df):
        return sorted(
            map(
                tuple,
                df.groupBy("doc_id")
                .agg(
                    F.max("lsn").alias("m"),
                    F.sum(
                        F.when(F.col("tokens").isNotNull(), F.size("tokens"))
                        .otherwise(0)
                    ).alias("t"),
                )
                .collect(),
            )
        )

    # empty-vs-null tokens on deletes: normalize the source side the same way
    assert summ(got) == summ(ev)
    # segments are lsn-range partitioned: each file is a contiguous range
    segs = sorted((tmp_path / "wal").glob("segment-*.rapwal"))
    assert len(segs) == n_written


def test_stream_tail_binlog_to_table(spark, sf_small, tmp_path):
    """Streaming the custom source into the lake converges to the batch
    replay of the same events — the full binlog->table path of the north
    rule on a non-parquet WAL."""
    from rap_etl_spark.engine import CdcEngine, assert_equivalent

    ev = _events(spark, sf_small, n=2000)
    write_binlog_segments(ev, str(tmp_path / "wal"), n_segments=3)
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

    q = (
        spark.readStream.format("rap-etl-binlog")
        .option("path", str(tmp_path / "wal"))
        .load()
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    t_batch = ManifestParquetTable.create(
        spark, str(tmp_path / "tb"), DOCS_SCHEMA, n_buckets=8
    )
    eng2 = CdcEngine(spark, t_batch)
    eng2.apply_batch(
        ev.withColumn("n_tok", F.size("tokens")).withColumn(
            "ingest_ts", F.current_timestamp()
        ),
        batch_id=0,
    )
    # tokens: empty list (binlog deletes) vs null — invisible on read()
    # (tombstones filtered); live rows must match exactly
    assert_equivalent(t_stream.read(), t_batch.read())


def test_corrupt_segment_rejected(tmp_path):
    p = tmp_path / "bad.rapwal"
    p.write_bytes(b"NOTMAGIC" + b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        decode_blocks(p.read_bytes())


def test_datasource_writer_modes(spark, sf_small, tmp_path):
    """df.write.format("rap-etl-binlog"): append continues numbering,
    overwrite replaces, wrong schemas are rejected at plan time."""
    import pyspark.sql.utils  # noqa: F401

    ev = _events(spark, sf_small, n=1500)
    register(spark)
    out = str(tmp_path / "w")
    (
        ev.repartitionByRange(3, "lsn")
        .write.format("rap-etl-binlog")
        .option("path", out)
        .mode("append")
        .save()
    )
    got = spark.read.format("rap-etl-binlog").option("path", out).load()
    n_first = got.count()
    assert n_first == ev.count()
    first_segs = sorted(p.name for p in (tmp_path / "w").glob("*.rapwal"))

    # append: numbering continues after the existing segments
    (
        ev.limit(10).repartition(1)
        .write.format("rap-etl-binlog")
        .option("path", out)
        .mode("append")
        .save()
    )
    segs = sorted(p.name for p in (tmp_path / "w").glob("*.rapwal"))
    assert segs[: len(first_segs)] == first_segs
    assert len(segs) == len(first_segs) + 1
    assert segs == [f"segment-{i:06d}.rapwal" for i in range(len(segs))]

    # overwrite: old segments gone, fresh numbering
    (
        ev.limit(5).repartition(1)
        .write.format("rap-etl-binlog")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    segs = sorted(p.name for p in (tmp_path / "w").glob("*.rapwal"))
    assert segs == ["segment-000000.rapwal"]
    assert (
        spark.read.format("rap-etl-binlog").option("path", out).load().count()
        == 5
    )

    # wrong shape rejected before any task runs
    with pytest.raises(Exception, match="binlog writer needs"):
        (
            ev.select("op", "doc_id", "lsn")
            .write.format("rap-etl-binlog")
            .option("path", str(tmp_path / "bad"))
            .mode("append")
            .save()
        )


def test_stream_sink_relay(spark, sf_small, tmp_path):
    """Streaming sink: readStream binlog -> writeStream binlog relays a
    WAL with identical content (rotation/fan-out shape), exactly-once via
    the sink checkpoint."""
    ev = _events(spark, sf_small, n=1200)
    write_binlog_segments(ev, str(tmp_path / "src"), n_segments=3)
    register(spark)
    q = (
        spark.readStream.format("rap-etl-binlog")
        .option("path", str(tmp_path / "src"))
        .load()
        .writeStream.format("rap-etl-binlog")
        .option("path", str(tmp_path / "dst"))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    src = spark.read.format("rap-etl-binlog").option(
        "path", str(tmp_path / "src")
    ).load()
    dst = spark.read.format("rap-etl-binlog").option(
        "path", str(tmp_path / "dst")
    ).load()
    assert dst.count() == src.count()
    assert src.exceptAll(dst).count() == 0


def test_segment_numbering_contiguous_with_empty_partitions(
    spark, sf_small, tmp_path
):
    """Empty range partitions must not leave numbering gaps: the driver
    renumbers at publish time, so the stream reader's consumed-count
    offset always addresses a contiguous prefix."""
    ev = _events(spark, sf_small, n=3000).limit(3)
    n = write_binlog_segments(ev, str(tmp_path / "wal"), n_segments=8)
    names = sorted(p.name for p in (tmp_path / "wal").glob("*.rapwal"))
    assert n == len(names)
    assert names == [f"segment-{i:06d}.rapwal" for i in range(n)]
    assert not list((tmp_path / "wal").glob("*.tmp"))  # temps swept


def test_stream_reader_rate_limit(spark, sf_small, tmp_path):
    """maxSegmentsPerTrigger bounds latestOffset growth once the reader
    knows its position (unit-level: drive offsets directly)."""
    from rap_etl_spark.sources.binlog import BinlogStreamReader

    ev = _events(spark, sf_small, n=2000)
    write_binlog_segments(ev, str(tmp_path / "wal"), n_segments=5)
    r = BinlogStreamReader(
        {"path": str(tmp_path / "wal"), "maxsegmentspertrigger": "2"}
    )
    assert r.initialOffset() == {"n": 0}
    first = r.latestOffset()["n"]  # restart edge: cap not yet known
    parts = r.partitions({"n": 0}, {"n": min(first, 2) or first})
    assert len(parts) >= 1
    r.commit({"n": 2})
    assert r.latestOffset()["n"] == 4  # 2 committed + maxSegmentsPerTrigger
    uncapped = BinlogStreamReader({"path": str(tmp_path / "wal")})
    assert uncapped.latestOffset()["n"] == 5
