"""Multi-table fanout routing (engine.fanout_apply): one WAL tail feeding
several lake tables with per-table ledger exactly-once — including the
crash-between-commits retry that repairs a partial batch."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rap_etl_spark.engine import fanout_apply
from rap_etl_spark.lake import ManifestParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("val", T.LongType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, ["_table", "doc_id", "lsn", "val", "op"]
    )


@pytest.fixture()
def two_tables(spark, tmp_path):
    a = ManifestParquetTable.create(
        spark, os.path.join(tmp_path, "a"), SCHEMA, n_buckets=2
    )
    b = ManifestParquetTable.create(
        spark, os.path.join(tmp_path, "b"), SCHEMA, n_buckets=2
    )
    return {"a": a, "b": b}


def test_fanout_routes_and_applies(spark, two_tables):
    batch = _batch(
        spark,
        [
            ("a", "k1", 1, 10, "U"),
            ("a", "k2", 1, 20, "U"),
            ("b", "k1", 1, 99, "U"),
        ],
    )
    out = fanout_apply(spark, batch, two_tables, batch_id=0, count_input=False)
    assert out["a"].applied_rows == 2 and out["b"].applied_rows == 1
    assert two_tables["a"].read().count() == 2
    rows_b = two_tables["b"].read().collect()
    assert [(r["doc_id"], r["val"]) for r in rows_b] == [("k1", 99)]


def test_fanout_crash_retry_repairs_partial_batch(spark, two_tables):
    batch = _batch(
        spark,
        [
            ("a", "k1", 1, 10, "U"),
            ("b", "k9", 1, 90, "U"),
        ],
    )
    # simulated crash: only table a's route committed before the failure
    fanout_apply(
        spark, batch, {"a": two_tables["a"]},
        batch_id=0, strict=False, count_input=False,
    )
    assert two_tables["b"].read().count() == 0
    # full retry of the SAME batch id: a skips via its ledger, b applies
    out = fanout_apply(spark, batch, two_tables, batch_id=0, count_input=False)
    assert out["a"].skipped is True
    assert out["b"].skipped is False and out["b"].applied_rows == 1
    # second full retry is a global no-op
    out2 = fanout_apply(spark, batch, two_tables, batch_id=0, count_input=False)
    assert out2["a"].skipped and out2["b"].skipped
    assert two_tables["a"].read().count() == 1
    assert two_tables["b"].read().count() == 1


def test_fanout_strict_refuses_unknown_tables(spark, two_tables):
    batch = _batch(spark, [("zzz", "k1", 1, 10, "U")])
    with pytest.raises(ValueError, match="unrouted tables.*zzz"):
        fanout_apply(spark, batch, two_tables, batch_id=0)
    # non-strict: unknown rows are simply not routed anywhere
    out = fanout_apply(
        spark, batch, two_tables, batch_id=1, strict=False, count_input=False
    )
    assert out["a"].applied_rows == 0 and out["b"].applied_rows == 0


def test_fanout_lww_and_deletes_per_route(spark, two_tables):
    batch = _batch(
        spark,
        [
            ("a", "k1", 1, 10, "U"),
            ("a", "k1", 2, 11, "U"),  # LWW winner within the route
            ("b", "k1", 5, 50, "U"),
            ("b", "k1", 6, 0, "D"),  # tombstone wins in b only
        ],
    )
    fanout_apply(spark, batch, two_tables, batch_id=0, count_input=False)
    a_rows = [(r["doc_id"], r["lsn"], r["val"]) for r in two_tables["a"].read().collect()]
    assert a_rows == [("k1", 2, 11)]
    assert two_tables["b"].read().count() == 0


def test_envelope_feed_fans_out_to_tables(spark, two_tables):
    """The full Debezium-server pipeline in one chain: multi-table wire
    envelopes -> decode (with _table from source.table) -> DLQ split ->
    fanout_apply. One feed, two tables, a tombstone, and a poisoned line."""
    from rap_etl_spark.engine import fanout_apply
    from rap_etl_spark.operators.cdc import parse_debezium_envelope, split_dlq

    def env(tbl, op, doc, lsn, val=None):
        if op == "d":
            before, after = '{"doc_id":"%s"}' % doc, "null"
        else:
            before = "null"
            after = '{"doc_id":"%s","val":%d}' % (doc, val)
        return (
            '{"op":"%s","before":%s,"after":%s,'
            '"source":{"lsn":%d,"table":"%s"},"ts_ms":%d}'
            % (op, before, after, lsn, tbl, lsn * 1000)
        )

    feed = spark.createDataFrame(
        [
            (env("a", "c", "k1", 1, 10),),
            (env("a", "u", "k1", 2, 11),),
            (env("b", "c", "k7", 1, 70),),
            (env("b", "d", "k7", 2),),
            ('{"op":"c","oops',),
        ],
        ["env"],
    )
    parsed = parse_debezium_envelope(
        feed, "env", "doc_id: STRING, val: BIGINT", include_table=True
    )
    good, dead = split_dlq(parsed, required=["doc_id", "lsn", "_table"])
    assert dead.count() == 1
    out = fanout_apply(
        spark, good.drop("ts_ms"), two_tables, batch_id=0, count_input=False
    )
    assert out["a"].applied_rows == 1
    a_rows = [(r["doc_id"], r["lsn"], r["val"]) for r in two_tables["a"].read().collect()]
    assert a_rows == [("k1", 2, 11)]
    assert two_tables["b"].read().count() == 0  # k7 tombstoned
