"""Custom binlog segment format + Spark Python DataSource (batch & stream).

The north rule's input is a "binlog/WAL-style change-event tail". Parquet
WALs are covered by sources/readers.py; this module covers the OTHER real
shape — a raw binary log a database/CDC agent emits — end to end:

- a columnar SEGMENT format (below) writable from executors,
- a batch `DataSourceReader` (one partition per segment, ZERO-COPY Arrow
  decode: the record batch is built from numpy/pyarrow buffers, no per-row
  Python on the hot columns),
- a streaming `DataSourceStreamReader` whose offset is the number of
  consumed segments — resumable exactly-once through the Structured
  Streaming checkpoint, same as the parquet tail.

Segment format (all little-endian), chosen columnar-per-block so decode is
bulk `np.frombuffer` slicing rather than per-record parsing:

    segment := MAGIC "RAPWAL01" , block*
    block   := u32 payload_len , payload
    payload := u32 n
             , i64 lsn[n]
             , u8  op[n]                     (ASCII I/U/D)
             , u32 id_len[n] , u32 src_len[n] , u32 tok_len[n]
             , u8  src_valid[n]              (0 = source IS NULL)
             , id_bytes , src_bytes , i32 tokens

Delete events carry zero-length token lists (their payload is never
surfaced: the merge tombstones the row and read() filters it). NULL
source values are preserved through the validity array — a parquet-WAL
replay and a binlog replay of the same events produce identical tables.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

MAGIC = b"RAPWAL01"

BINLOG_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("source", T.StringType(), True),
    ]
)

ARROW_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("doc_id", pa.string()),
        ("lsn", pa.int64()),
        ("tokens", pa.list_(pa.int32())),
        ("source", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# encode / decode (shared by writer, reader, tests)
# ---------------------------------------------------------------------------
def encode_block(pdf) -> bytes:
    """pandas frame (op, doc_id, lsn, tokens, source) -> one framed block.
    String encoding is the only per-row step (CPython requirement); all
    numeric columns are single astype/tobytes calls."""
    import pandas as pd

    n = len(pdf)
    lsn = np.asarray(pdf["lsn"], dtype="<i8").tobytes()
    op = np.frombuffer("".join(pdf["op"]).encode("ascii"), dtype=np.uint8)
    if len(op) != n:
        raise ValueError("op must be single ASCII characters")
    ids = [s.encode("utf-8") for s in pdf["doc_id"]]
    src_valid = np.array(
        [0 if pd.isna(s) else 1 for s in pdf["source"]], dtype=np.uint8
    )
    srcs = [
        b"" if not v else s.encode("utf-8")
        for v, s in zip(src_valid, pdf["source"])
    ]
    toks = [
        np.asarray(a if a is not None else [], dtype="<i4") for a in pdf["tokens"]
    ]
    id_len = np.array([len(b) for b in ids], dtype="<u4")
    src_len = np.array([len(b) for b in srcs], dtype="<u4")
    tok_len = np.array([len(a) for a in toks], dtype="<u4")
    tok_flat = np.concatenate(toks) if toks else np.array([], dtype="<i4")
    payload = b"".join(
        [
            struct.pack("<I", n),
            lsn,
            op.tobytes(),
            id_len.tobytes(),
            src_len.tobytes(),
            tok_len.tobytes(),
            src_valid.tobytes(),
            b"".join(ids),
            b"".join(srcs),
            tok_flat.astype("<i4").tobytes(),
        ]
    )
    return struct.pack("<I", len(payload)) + payload


def _string_array(
    lens: np.ndarray, data: bytes, valid: np.ndarray | None = None
) -> pa.Array:
    """Zero-copy Arrow StringArray from (lengths, concatenated utf8) plus
    an optional validity array (uint8 per row, 0 = null)."""
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    bitmap = None
    null_count = 0
    if valid is not None:
        null_count = int(len(valid) - valid.sum())
        if null_count:
            bitmap = pa.py_buffer(
                np.packbits(
                    valid.astype(bool), bitorder="little"
                ).tobytes()
            )
    return pa.StringArray.from_buffers(
        len(lens),
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(data),
        bitmap,
        null_count if bitmap is not None else 0,
    )


def decode_blocks(buf: bytes) -> list[pa.RecordBatch]:
    """Segment bytes -> Arrow record batches, built from buffers (the only
    Python loop is over BLOCKS, not records)."""
    if buf[: len(MAGIC)] != MAGIC:
        raise ValueError("bad segment magic")
    pos = len(MAGIC)
    out: list[pa.RecordBatch] = []
    while pos < len(buf):
        (plen,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        end = pos + plen
        (n,) = struct.unpack_from("<I", buf, pos)
        p = pos + 4
        lsn = np.frombuffer(buf, "<i8", n, p); p += 8 * n
        op_raw = buf[p : p + n]; p += n
        id_len = np.frombuffer(buf, "<u4", n, p); p += 4 * n
        src_len = np.frombuffer(buf, "<u4", n, p); p += 4 * n
        tok_len = np.frombuffer(buf, "<u4", n, p); p += 4 * n
        src_valid = np.frombuffer(buf, np.uint8, n, p); p += n
        id_total = int(id_len.sum()); src_total = int(src_len.sum())
        id_bytes = buf[p : p + id_total]; p += id_total
        src_bytes = buf[p : p + src_total]; p += src_total
        n_tok = int(tok_len.sum())
        tok_flat = np.frombuffer(buf, "<i4", n_tok, p); p += 4 * n_tok
        if p != end:
            raise ValueError("corrupt block framing")
        pos = end

        tok_offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(tok_len, out=tok_offsets[1:])
        tokens = pa.ListArray.from_arrays(
            pa.array(tok_offsets, type=pa.int32()),
            pa.array(tok_flat, type=pa.int32()),
        )
        batch = pa.RecordBatch.from_arrays(
            [
                _string_array(np.ones(n, dtype=np.int32), op_raw),
                _string_array(id_len.astype(np.int32), id_bytes),
                pa.array(lsn, type=pa.int64()),
                tokens,
                _string_array(
                    src_len.astype(np.int32), src_bytes, src_valid
                ),
            ],
            schema=ARROW_SCHEMA,
        )
        out.append(batch)
    return out


# ---------------------------------------------------------------------------
# writer (Spark DataSource commit protocol)
#
# Publish protocol (what makes the streaming reader's offset sound):
# executors write each partition to an ATTEMPT-UNIQUE temp file — a retried
# or speculative task can never interleave writes into a published segment —
# and the DRIVER's commit() os.replace-renames the successful attempts'
# temps to their final names in ascending partition order with contiguous
# numbering. Segments therefore become visible in name order with no gaps
# (empty partitions publish nothing), which is exactly the premise
# BinlogStreamReader's consumed-count offset needs. abort() deletes the
# temps. Requires the directory on storage shared by driver and executors;
# one writer per directory at a time (the binlog-rotation model).
# ---------------------------------------------------------------------------
@dataclass
class SegmentCommit(WriterCommitMessage):
    pid: int
    tmp: str | None
    rows: int


def _write_task_tmp(out_dir: str, arrow_batches) -> SegmentCommit:
    """Executor side: encode this task's Arrow batches into one
    attempt-unique temp file; never touches a published name."""
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid, att = tc.partitionId(), tc.attemptNumber()
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f".part-{pid:06d}-a{att}.tmp")
    wrote = 0
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        for batch in arrow_batches:
            pdf = batch.to_pandas()
            if len(pdf):
                f.write(encode_block(pdf))
                wrote += len(pdf)
    if not wrote:
        os.remove(tmp)
        return SegmentCommit(pid, None, 0)
    return SegmentCommit(pid, tmp, wrote)


def _segment_index(path: str) -> int:
    return int(os.path.basename(path)[len("segment-") : -len(".rapwal")])


def _sweep_tmps(out_dir: str) -> None:
    # losers of task retries leave orphan temps; readers list only
    # *.rapwal, so this is cosmetic
    if not os.path.isdir(out_dir):
        return
    for f in os.listdir(out_dir):
        if f.endswith(".tmp"):
            try:
                os.remove(os.path.join(out_dir, f))
            except OSError:
                pass


def _publish(out_dir: str, messages, start_seq: int | None = None) -> int:
    """Driver side: ordered atomic rename, numbering continuing after any
    existing segments (unless start_seq pins the base). Shared by the
    batch commit, the per-micro-batch stream commit, and abort-free
    callers."""
    os.makedirs(out_dir, exist_ok=True)
    if start_seq is None:
        existing = [_segment_index(p) for p in _list_segments(out_dir)]
        start_seq = (max(existing) + 1) if existing else 0
    published = 0
    todo = sorted(
        (m for m in messages if m is not None and m.tmp is not None),
        key=lambda m: m.pid,
    )
    for m in todo:
        final = os.path.join(
            out_dir, f"segment-{start_seq + published:06d}.rapwal"
        )
        os.replace(m.tmp, final)  # atomic, in name order
        published += 1
    _sweep_tmps(out_dir)
    return published


def _drop_tmps(messages) -> None:
    for m in messages:
        if m is not None and m.tmp is not None:
            try:
                os.remove(m.tmp)
            except OSError:
                pass


class BinlogBatchWriter(DataSourceArrowWriter):
    """df.write.format("rap-etl-binlog"): mode("append") continues the
    segment numbering; mode("overwrite") clears published segments at
    commit time (readers keep a consistent view until then)."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.start_seq = options.get("startseq")
        self.overwrite = overwrite

    def write(self, iterator) -> SegmentCommit:
        return _write_task_tmp(self.path, iterator)

    def commit(self, messages) -> None:
        if self.overwrite:
            for p in _list_segments(self.path):
                os.remove(p)
        _publish(
            self.path,
            messages,
            int(self.start_seq) if self.start_seq is not None else None,
        )

    def abort(self, messages) -> None:
        _drop_tmps(messages)
        _sweep_tmps(self.path)


class BinlogStreamSegmentWriter(DataSourceStreamArrowWriter):
    """Streaming SINK: each micro-batch's partitions publish as new
    segments after the existing ones — binlog rotation driven by a stream
    (change-event fan-out). Structured Streaming skips commit() for batch
    ids already in the sink checkpoint, so a restart does not re-publish a
    completed micro-batch; a batch that failed BEFORE commit leaves only
    temps, which the next commit sweeps."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> SegmentCommit:
        return _write_task_tmp(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        _publish(self.path, messages)

    def abort(self, messages, batchId: int) -> None:
        _drop_tmps(messages)
        _sweep_tmps(self.path)


def write_binlog_segments(
    events: DataFrame, out_dir: str, n_segments: int, start_seq: int = 0
) -> int:
    """Write events as segment files through the DataSource commit
    protocol, range-partitioned by lsn so each segment is a contiguous LSN
    range (what a real binlog rotation produces). Returns segments
    published (empty range partitions publish nothing)."""
    register(events.sparkSession)
    before = set(_list_segments(out_dir)) if os.path.isdir(out_dir) else set()
    cols = ["op", "doc_id", "lsn", "tokens", "source"]
    writer = (
        events.select(*cols)
        .repartitionByRange(n_segments, "lsn")
        .write.format("rap-etl-binlog")
        .option("path", out_dir)
        .mode("append")
    )
    if start_seq:
        writer = writer.option("startSeq", start_seq)
    writer.save()
    return len(set(_list_segments(out_dir)) - before)


# ---------------------------------------------------------------------------
# Spark Python DataSource
# ---------------------------------------------------------------------------
class SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _list_segments(path: str) -> list[str]:
    if os.path.isfile(path):  # single-segment read (CLI per-batch replay)
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".rapwal")
    )


def as_events(df: DataFrame) -> DataFrame:
    """Binlog wire frame -> EVENTS_SCHEMA shape for the CDC engine: the
    wire carries only facts (op, doc_id, lsn, tokens, source); deletes'
    empty on-wire token lists become NULL, and the derived columns
    (n_tok, ingest_ts) are computed here, JVM-side."""
    from pyspark.sql import functions as F

    is_del = F.col("op") == "D"
    return df.select(
        "op",
        "doc_id",
        "lsn",
        F.when(is_del, F.lit(None).cast("array<int>"))
        .otherwise(F.col("tokens"))
        .alias("tokens"),
        F.when(~is_del, F.size("tokens")).cast("int").alias("n_tok"),
        "source",
        F.current_timestamp().alias("ingest_ts"),
    )


def _read_segment(path: str):
    with open(path, "rb") as f:
        buf = f.read()
    yield from decode_blocks(buf)


class BinlogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        return [SegmentPartition(p) for p in _list_segments(self.path)]

    def read(self, partition):
        # yielding pyarrow RecordBatches keeps the whole decode vectorized
        yield from _read_segment(partition.path)


class BinlogStreamReader(DataSourceStreamReader):
    """Offset = count of consumed segments. Sound because
    write_binlog_segments publishes segments atomically IN name order with
    contiguous numbering (driver-side ordered rename) — a listed segment
    can never be preceded by a not-yet-visible lower-numbered one. Each
    micro-batch reads the new segments, one Arrow-decoded partition per
    segment — executor-side, no driver data.

    Option ``maxSegmentsPerTrigger`` bounds micro-batch size: latestOffset
    advances at most that many segments past the last planned/committed
    offset (the first trigger after a driver restart may exceed the cap —
    the reader instance learns its position when partitions() is first
    called)."""

    def __init__(self, options):
        self.path = options["path"]
        self.max_per_trigger = (
            int(options.get("maxsegmentspertrigger", 0)) or None
        )
        self._last_end: int | None = None

    def initialOffset(self):
        return {"n": 0}

    def latestOffset(self):
        n = len(_list_segments(self.path))
        if self.max_per_trigger is not None and self._last_end is not None:
            n = min(n, self._last_end + self.max_per_trigger)
        return {"n": n}

    def partitions(self, start, end):
        self._last_end = end["n"]
        segs = _list_segments(self.path)[start["n"] : end["n"]]
        return [SegmentPartition(p) for p in segs]

    def read(self, partition):
        # same zero-copy Arrow batches as the batch reader (the Python
        # DataSource stream API accepts RecordBatch iterators)
        yield from _read_segment(partition.path)

    def commit(self, end):
        self._last_end = end["n"]


class BinlogDataSource(DataSource):
    """Batch + streaming, read + write:

    - spark.read.format("rap-etl-binlog").option("path", dir).load()
    - spark.readStream.format("rap-etl-binlog").option("path", dir).load()
    - df.write.format("rap-etl-binlog").option("path", dir).save()
    - df.writeStream.format("rap-etl-binlog").option("path", dir)...
    """

    @classmethod
    def name(cls):
        return "rap-etl-binlog"

    def schema(self):
        return BINLOG_SCHEMA

    def reader(self, schema):
        return BinlogBatchReader(self.options)

    def streamReader(self, schema):
        return BinlogStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        _check_writable_schema(schema)
        return BinlogBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        _check_writable_schema(schema)
        return BinlogStreamSegmentWriter(self.options)


def _check_writable_schema(schema) -> None:
    want = {f.name: f.dataType.simpleString() for f in BINLOG_SCHEMA.fields}
    got = {f.name: f.dataType.simpleString() for f in schema.fields}
    if got != want:
        raise ValueError(
            f"binlog writer needs columns {want}, got {got} — "
            "select (op, doc_id, lsn, tokens, source) first"
        )


def register(spark) -> None:
    spark.dataSource.register(BinlogDataSource)
