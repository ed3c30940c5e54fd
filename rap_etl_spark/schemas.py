"""Binding schemas for the CDC engine (SURVEY.md §1.2, BASELINE.json input_hint).

Target table ``docs``: pre-tokenized training sequences.
Change-event stream ``change_events``: the WAL/binlog generalization of the
reference's per-record re-harvest (rap-etl maps one publication record to a
fresh RDF subgraph; here one change event carries the fresh row payload).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- target table (exact shape is binding: BASELINE.json input_hint) ---
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# Schema-evolution variant: +lang column, int32 -> int64 widening.
DOCS_SCHEMA_V2 = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.LongType()), True),
        T.StructField("n_tok", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# --- change-event stream (WAL/binlog tail) ---
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),  # global, unique, monotone
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),  # null for D
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ingest_ts", T.TimestampType(), False),
    ]
)

# Packed WAL variant: tokens travel as one BINARY column (little-endian
# int32), the wire format a real binlog/Kafka tail would carry. Parquet
# decodes one byte blob per row instead of assembling an array cell per
# token — measured ~10x cheaper scan (BENCH/BASELINE.md) — and the blob is
# only expanded to array<int32> for the (tiny) winner set at merge time
# (engine.py / functions.tokens.unpack_tokens). The TARGET table keeps the
# binding array<int32> schema either way.
EVENTS_SCHEMA_PACKED = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("tokens_bin", T.BinaryType(), True),  # packed <i4, null for D
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ingest_ts", T.TimestampType(), False),
    ]
)

EVENTS_SCHEMA_V2 = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.LongType()), True),
        T.StructField("n_tok", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("ingest_ts", T.TimestampType(), False),
    ]
)

# --- lineage: per-partition audit records (SURVEY.md C9) ---
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("lsn_min", T.LongType(), True),
        T.StructField("lsn_max", T.LongType(), True),
        T.StructField("rows_applied", T.LongType(), False),
        T.StructField("snapshot_id", T.StringType(), True),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

# Columns of the docs payload (everything except the key).
PAYLOAD_COLS = ["tokens", "n_tok", "source"]
