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
             , id_bytes , src_bytes , i32 tokens

Delete events carry zero-length token lists (their payload is never
surfaced: the merge tombstones the row and read() filters it).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
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
    n = len(pdf)
    lsn = np.asarray(pdf["lsn"], dtype="<i8").tobytes()
    op = np.frombuffer("".join(pdf["op"]).encode("ascii"), dtype=np.uint8)
    if len(op) != n:
        raise ValueError("op must be single ASCII characters")
    ids = [s.encode("utf-8") for s in pdf["doc_id"]]
    srcs = [(s or "").encode("utf-8") for s in pdf["source"]]
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
            b"".join(ids),
            b"".join(srcs),
            tok_flat.astype("<i4").tobytes(),
        ]
    )
    return struct.pack("<I", len(payload)) + payload


def _string_array(lens: np.ndarray, data: bytes) -> pa.Array:
    """Zero-copy Arrow StringArray from (lengths, concatenated utf8)."""
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.StringArray.from_buffers(
        len(lens), pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)
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
                _string_array(src_len.astype(np.int32), src_bytes),
            ],
            schema=ARROW_SCHEMA,
        )
        out.append(batch)
    return out


# ---------------------------------------------------------------------------
# writer (executor-side: one segment per partition)
# ---------------------------------------------------------------------------
def write_binlog_segments(
    events: DataFrame, out_dir: str, n_segments: int, start_seq: int = 0
) -> int:
    """Write events as `n_segments` segment files, ordered by lsn so each
    segment is a contiguous LSN range (what a real binlog rotation
    produces). Executors write directly (the dir must be shared storage on
    a cluster). Returns segments written."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    os.makedirs(out_dir, exist_ok=True)
    cols = ["op", "doc_id", "lsn", "tokens", "source"]
    src = events.select(*cols).repartitionByRange(n_segments, "lsn")

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"segment-{start_seq + pid:06d}.rapwal")
        tmp = path + ".tmp"
        wrote = 0
        with open(tmp, "wb") as f:
            f.write(MAGIC)
            for pdf in batches:
                if len(pdf):
                    f.write(encode_block(pdf))
                    wrote += len(pdf)
        if wrote:
            os.replace(tmp, path)  # atomic: tailers never see half a segment
        else:
            os.remove(tmp)
        import pandas as pd

        yield pd.DataFrame({"segment": [path if wrote else None], "rows": [wrote]})

    res = src.mapInPandas(write_part, "segment string, rows long").collect()
    return sum(1 for r in res if r["segment"] is not None)


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
    """Offset = count of consumed segments (files are named monotonically
    and appear atomically via os.replace). Each micro-batch reads the new
    segments, one partition per segment — executor-side, no driver data."""

    def __init__(self, options):
        self.path = options["path"]

    def initialOffset(self):
        return {"n": 0}

    def latestOffset(self):
        return {"n": len(_list_segments(self.path))}

    def partitions(self, start, end):
        segs = _list_segments(self.path)[start["n"] : end["n"]]
        return [SegmentPartition(p) for p in segs]

    def read(self, partition):
        for batch in _read_segment(partition.path):
            yield from (tuple(r) for r in zip(*[c.to_pylist() for c in batch.columns]))

    def commit(self, end):
        pass


class BinlogDataSource(DataSource):
    """spark.read.format("rap-etl-binlog").option("path", dir).load()"""

    @classmethod
    def name(cls):
        return "rap-etl-binlog"

    def schema(self):
        return BINLOG_SCHEMA

    def reader(self, schema):
        return BinlogBatchReader(self.options)

    def streamReader(self, schema):
        return BinlogStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(BinlogDataSource)
