"""Unit tests for the CDC connector surface (cdc.parse_debezium_envelope,
cdc.split_dlq, cdc.replication_lag, text.unigram_drift) — semantics beyond
the DuckDB oracle gate in test_query_oracles.py: malformed-envelope routing,
delete key recovery from the before-image, missing-partition lag, drift
identities, and bootstrap redelivery convergence."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from rap_etl_spark.operators.cdc import (
    parse_debezium_envelope,
    replication_lag,
    split_dlq,
)

PAYLOAD = "doc_id: STRING, price_c: BIGINT"


def _envelopes(spark):
    rows = [
        ('{"op":"c","before":null,"after":{"doc_id":"a","price_c":100},'
         '"source":{"lsn":1,"table":"docs"},"ts_ms":1000}',),
        ('{"op":"u","before":null,"after":{"doc_id":"a","price_c":200},'
         '"source":{"lsn":2,"table":"docs"},"ts_ms":2000}',),
        # delete: key travels in the before-image only
        ('{"op":"d","before":{"doc_id":"a"},"after":null,'
         '"source":{"lsn":3,"table":"docs"},"ts_ms":3000}',),
        # snapshot read op r maps to I like c
        ('{"op":"r","before":null,"after":{"doc_id":"b","price_c":50},'
         '"source":{"lsn":4,"table":"docs"},"ts_ms":4000}',),
        ('{"op":"u","before":nul',),  # truncated mid-token: malformed
        ('{"op":"u","before":null,"after":{"price_c":7},'
         '"source":{"lsn":5,"table":"docs"},"ts_ms":5000}',),  # no key
    ]
    return spark.createDataFrame(rows, ["env"])


def test_envelope_parse_op_mapping_and_delete_key(spark):
    parsed = parse_debezium_envelope(_envelopes(spark), "env", PAYLOAD)
    rows = {r["lsn"]: r for r in parsed.collect() if r["lsn"] is not None}
    assert rows[1]["op"] == "I" and rows[1]["price_c"] == 100
    assert rows[2]["op"] == "U"
    # delete recovered its key from before, payload null
    assert rows[3]["op"] == "D" and rows[3]["doc_id"] == "a"
    assert rows[3]["price_c"] is None
    assert rows[4]["op"] == "I"  # snapshot read
    # the malformed row surfaced instead of failing the batch
    bad = parsed.filter(F.col("_corrupt").isNotNull()).collect()
    assert len(bad) == 1


def test_split_dlq_routes_and_conserves(spark):
    parsed = parse_debezium_envelope(_envelopes(spark), "env", PAYLOAD)
    good, dead = split_dlq(parsed, required=["doc_id", "lsn"])
    g, d = good.collect(), dead.collect()
    assert len(g) + len(d) == 6
    assert len(g) == 4  # c, u, d, r
    reasons = sorted(r["dlq_reason"] for r in d)
    assert reasons == ["malformed_json", "missing_field:doc_id"]
    # good frame is clean of plumbing columns
    assert "_corrupt" not in good.columns and "dlq_reason" not in good.columns


def test_replication_lag_missing_partition(spark):
    src = spark.createDataFrame(
        [("p1", 1), ("p1", 2), ("p1", 3), ("p2", 10), ("p2", 11)],
        ["part", "lsn"],
    )
    applied = src.filter((F.col("part") == "p1") & (F.col("lsn") <= 2))
    out = {
        r["part"]: r
        for r in replication_lag(src, applied, part_col="part").collect()
    }
    assert out["p1"]["source_max_lsn"] == 3
    assert out["p1"]["applied_max_lsn"] == 2
    assert out["p1"]["lag_events"] == 1
    # partition never applied: everything outstanding, applied watermark null
    assert out["p2"]["applied_max_lsn"] is None
    assert out["p2"]["lag_events"] == 2


def test_replication_lag_caught_up_is_zero(spark):
    src = spark.createDataFrame([("p1", 5)], ["part", "lsn"])
    out = replication_lag(src, src, part_col="part").collect()[0]
    assert out["lag_events"] == 0
    assert out["source_max_lsn"] == out["applied_max_lsn"] == 5


def test_unigram_drift_identity_and_hand_value(spark):
    from rap_etl_spark.operators.text import unigram_drift

    # single source: its distribution IS the corpus distribution -> 0
    one = spark.createDataFrame([("s1", "a b a"), ("s1", "b c")], ["source", "text"])
    assert unigram_drift(one).collect()[0]["drift_num"] == 0

    # two sources, hand-computable: s1 = {a:2, b:1}, s2 = {b:1, c:2}
    # corpus = {a:2, b:2, c:2}, n1 = n2 = 3, N = 6
    # s1: present a: |2*6-2*3| = 6, b: |1*6-2*3| = 0; absent c: 3*2 = 6 -> 12
    two = spark.createDataFrame(
        [("s1", "a b a"), ("s2", "b c c")], ["source", "text"]
    )
    out = {r["source"]: r for r in unigram_drift(two).collect()}
    assert out["s1"]["drift_num"] == 12
    assert out["s2"]["drift_num"] == 12  # symmetric construction
    assert out["s1"]["n_group"] == 3 and out["s1"]["n_all"] == 6
    # TV distance sanity: 12 / (2*3*6) = 1/3
    assert out["s1"]["drift_num"] / (2 * 3 * 6) == pytest.approx(1 / 3)


def test_bootstrap_tail_redelivery_converges(spark, sf_small):
    """Redelivering the bootstrap tail under NEW batch ids (not the ledger
    no-op path) must leave the table state unchanged: every resent event
    loses the version condition."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import initial_load
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest

    ev = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .select(
            F.col("o_custkey").cast("string").alias("doc_id"),
            F.col("o_orderkey").alias("lsn"),
            F.col("o_totalprice").alias("price"),
            F.when(F.col("o_orderkey") % 7 == 3, "D").otherwise("U").alias("op"),
        )
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    max_lsn = ev.agg(F.max("lsn")).first()[0]
    snap_lsn = max_lsn // 2
    tail = ev.filter(F.col("lsn") > snap_lsn - snap_lsn // 4)
    with tempfile.TemporaryDirectory(prefix="rap-etl-boot-redeliver-") as work:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=4
        )
        snap = lww_latest(ev.filter(F.col("lsn") <= snap_lsn))
        initial_load(
            spark, table,
            snap.filter(F.col("op") != "D").select("doc_id", "lsn", "price"),
            batch_id=0,
        )
        table.merge(lww_latest(tail), batch_id=1)
        state1 = sorted(map(tuple, table.read().collect()))
        table.merge(lww_latest(tail), batch_id=2)  # full redelivery, new id
        state2 = sorted(map(tuple, table.read().collect()))
        assert state1 == state2


def test_emit_parse_is_identity(spark):
    """parse(emit(x)) == x for all three ops, including the null
    after-image on deletes and explicit-null payload columns."""
    from pyspark.sql import types as T

    from rap_etl_spark.operators.cdc import emit_debezium_envelope

    rows = [
        ("a", 1, 100, "I"),
        ("a", 2, None, "U"),  # column went NULL on an update
        ("a", 3, None, "D"),
        ("b", 4, 50, "I"),
    ]
    ev = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("price_c", T.LongType()),
                T.StructField("op", T.StringType()),
            ]
        ),
    )
    env = emit_debezium_envelope(ev, ["price_c"])
    back = parse_debezium_envelope(env, "env", PAYLOAD)
    got = {
        (r.doc_id, r.lsn, r.op, r.price_c, r.ts_ms)
        for r in back.collect()
    }
    want = {
        (k, l, op, None if op == "D" else p, l * 1000)
        for k, l, p, op in rows
    }
    assert got == want
    assert back.filter(F.col("_corrupt").isNotNull()).count() == 0


def test_changefeed_envelopes_end_to_end(spark, tmp_path):
    """table_changes -> one Debezium envelope per (key, lsn): updates fold
    pre+postimage into a single u carrying BOTH images, inserts are c with
    after only, deletes d with before only — and the inbound parser
    reconstructs the postimage change stream from the emitted feed."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import changefeed_envelopes

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price_c", T.LongType()),
        ]
    )
    ev_schema = T.StructType(
        schema.fields + [T.StructField("op", T.StringType())]
    )
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), schema, n_buckets=4)
    b1 = spark.createDataFrame(
        [("a", 1, 10, "I"), ("b", 2, 20, "I"), ("c", 3, 30, "I")], ev_schema
    )
    t.merge(b1, batch_id=0)
    s1 = t.snapshot_id()
    b2 = spark.createDataFrame(
        [("a", 4, 40, "U"), ("b", 5, None, "D"), ("d", 6, 60, "I")], ev_schema
    )
    t.merge(b2, batch_id=1)

    feed = changefeed_envelopes(t, s1, ["price_c"])
    envs = [r.env for r in feed.collect()]
    assert len(envs) == 3  # one per changed key, pre+post folded

    parsed = parse_debezium_envelope(
        spark.createDataFrame([(e,) for e in envs], ["env"]), "env", PAYLOAD
    )
    got = {
        (r.doc_id, r.lsn, r.op, r.price_c) for r in parsed.collect()
    }
    assert got == {("a", 4, "U", 40), ("b", 5, "D", None), ("d", 6, "I", 60)}

    # the u envelope must carry the true preimage (price_c=10)
    import json

    u = next(json.loads(e) for e in envs if json.loads(e)["op"] == "u")
    assert u["before"]["price_c"] == 10 and u["after"]["price_c"] == 40
    d = next(json.loads(e) for e in envs if json.loads(e)["op"] == "d")
    assert d["before"]["doc_id"] == "b" and d["after"] is None


def test_emit_update_carries_key_only_before(spark):
    """With no preimage columns supplied, a 'u' envelope still carries a
    key-only before-image (Debezium consumers key updates off before.pk);
    and a before_cols/payload_cols length mismatch raises."""
    import json

    from pyspark.sql import types as T

    from rap_etl_spark.operators.cdc import emit_debezium_envelope

    ev = spark.createDataFrame(
        [("a", 1, 100, "U")],
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("price_c", T.LongType()),
                T.StructField("op", T.StringType()),
            ]
        ),
    )
    env = json.loads(emit_debezium_envelope(ev, ["price_c"]).first()["env"])
    assert env["op"] == "u" and env["before"] == {"doc_id": "a"}

    with pytest.raises(ValueError, match="one-to-one"):
        emit_debezium_envelope(ev, ["price_c"], before_cols=["x", "y"])
