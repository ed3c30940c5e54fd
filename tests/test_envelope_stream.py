"""Streaming envelope ingestion (streaming.stream_envelope_tail): JSON-lines
Debezium envelopes tailed into a lake table with DLQ quarantine — decode,
exactly-once apply, malformed-row routing, and checkpoint-resume
convergence."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.streaming.tail import stream_envelope_tail

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("price_c", T.LongType()),
    ]
)

PAYLOAD_DDL = "doc_id: STRING, price_c: BIGINT"


def _env(op, doc, lsn, price=None):
    if op == "d":
        before, after = '{"doc_id":"%s"}' % doc, "null"
    else:
        before = "null"
        after = '{"doc_id":"%s","price_c":%d}' % (doc, price)
    return (
        '{"op":"%s","before":%s,"after":%s,'
        '"source":{"lsn":%d,"table":"docs"},"ts_ms":%d}'
        % (op, before, after, lsn, lsn * 1000)
    )


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_envelope_tail_applies_and_quarantines(spark, tmp_path):
    src = str(tmp_path / "feed")
    _write_lines(
        os.path.join(src, "f0.jsonl"),
        [
            _env("c", "a", 1, 100),
            _env("u", "a", 2, 150),
            _env("c", "b", 3, 50),
            '{"op":"u","bro',  # malformed -> DLQ, not a query failure
            _env("d", "b", 4),
        ],
    )
    table = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=2
    )
    q = stream_envelope_tail(
        spark,
        src,
        str(tmp_path / "cp"),
        table,
        PAYLOAD_DDL,
        dlq_dir=str(tmp_path / "dlq"),
    )
    q.awaitTermination()
    rows = [(r["doc_id"], r["lsn"], r["price_c"]) for r in table.read().collect()]
    assert rows == [("a", 2, 150)]  # b deleted by its tombstone
    dlq = spark.read.parquet(str(tmp_path / "dlq" / "batch=0"))
    assert dlq.count() == 1
    assert dlq.collect()[0]["dlq_reason"] == "malformed_json"


def test_envelope_tail_resumes_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "feed")
    cp = str(tmp_path / "cp")
    table = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=2
    )
    _write_lines(os.path.join(src, "f0.jsonl"), [_env("c", "a", 1, 100)])
    stream_envelope_tail(spark, src, cp, table, PAYLOAD_DDL).awaitTermination()
    # new file lands; a fresh query on the SAME checkpoint processes only it
    _write_lines(os.path.join(src, "f1.jsonl"), [_env("u", "a", 2, 200)])
    stream_envelope_tail(spark, src, cp, table, PAYLOAD_DDL).awaitTermination()
    rows = [(r["doc_id"], r["lsn"], r["price_c"]) for r in table.read().collect()]
    assert rows == [("a", 2, 200)]
    # and rerunning with NOTHING new is a clean no-op
    stream_envelope_tail(spark, src, cp, table, PAYLOAD_DDL).awaitTermination()
    assert table.read().count() == 1


def _venv(op, doc, lsn, price=None, sv=1):
    """Envelope with a wire-level schema_version stamp (X100)."""
    e = _env(op, doc, lsn, price)
    return e[:-1] + ',"schema_version":%d}' % sv


def test_envelope_tail_registry_gate(spark, tmp_path):
    """X100 end-to-end: rows stamped with unregistered versions quarantine
    with a reason; registering the version BETWEEN availableNow runs makes
    the next batch of that version flow — the gate re-reads the registry
    per epoch."""
    from pyspark.sql import types as T

    from rap_etl_spark.sources.registry import SchemaRegistry

    reg = SchemaRegistry(str(tmp_path / "reg"))
    reg.register(
        "docs",
        T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField("price_c", T.LongType(), True),
            ]
        ),
    )
    src = str(tmp_path / "feed")
    cp = str(tmp_path / "cp")
    dlq = str(tmp_path / "dlq")
    table = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=2
    )
    _write_lines(
        os.path.join(src, "f0.jsonl"),
        [
            _venv("c", "a", 1, 100, sv=1),
            _venv("c", "b", 2, 200, sv=2),  # v2 not registered yet
        ],
    )
    stream_envelope_tail(
        spark, src, cp, table, PAYLOAD_DDL, dlq_dir=dlq, registry=reg
    ).awaitTermination()
    assert [(r["doc_id"], r["lsn"]) for r in table.read().collect()] == [
        ("a", 1)
    ]
    d0 = spark.read.parquet(os.path.join(dlq, "batch=0"))
    assert d0.collect()[0]["dlq_reason"] == "unregistered_schema:2"

    # producer registers v2 (a legal nullable addition), resends the row
    reg.register(
        "docs",
        T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField("price_c", T.LongType(), True),
                T.StructField("note", T.StringType(), True),
            ]
        ),
    )
    _write_lines(
        os.path.join(src, "f1.jsonl"), [_venv("c", "b", 3, 200, sv=2)]
    )
    stream_envelope_tail(
        spark, src, cp, table, PAYLOAD_DDL, dlq_dir=dlq, registry=reg
    ).awaitTermination()
    rows = sorted(
        (r["doc_id"], r["lsn"]) for r in table.read().collect()
    )
    assert rows == [("a", 1), ("b", 3)]
