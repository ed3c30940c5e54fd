"""Multi-writer OCC at the engine level: a merge that loses the manifest
pointer CAS is rebased (manifest refresh) and retried from the staged
delta; a concurrent commit of the SAME batch_id turns the retry into a
ledger skip."""

import pytest
from pyspark.sql import types as T

from rap_etl_spark.engine import CdcEngine
from rap_etl_spark.lake import CommitConflictError, ManifestParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def mk(spark, path):
    t = ManifestParquetTable.create(spark, path, SCHEMA, n_buckets=4)
    t.append(
        spark.createDataFrame(
            [(f"k{i}", i) for i in range(20)], "doc_id string, val long"
        ),
        batch_id=0,
        assume_unique=True,
    )
    return t


def events(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, op string, lsn long, val long")


def _conflict_once(t, spark, n=1, rival=None):
    """Make the next n manifest writes lose the CAS (as if a concurrent
    writer swapped the pointer first), optionally running `rival` inside
    the losing window — exactly the interleaving a real race produces."""
    orig = t._write_manifest
    state = {"left": n}

    def racy(manifest):
        if state["left"] > 0:
            state["left"] -= 1
            if rival is not None:
                rival()
            raise CommitConflictError("manifest moved: concurrent commit")
        return orig(manifest)

    t._write_manifest = racy
    return t


def test_retry_rebases_and_commits(spark, tmp_path):
    t = mk(spark, str(tmp_path / "t"))
    t2 = ManifestParquetTable(spark, t.path)  # the concurrent writer

    def rival():
        t2.merge(events(spark, [("k1", "U", 100, 111)]), batch_id=7)

    _conflict_once(t, spark, rival=rival)
    eng = CdcEngine(spark, t)
    m = eng.apply_batch(events(spark, [("k2", "U", 200, 222)]), batch_id=8)
    assert not m.skipped
    got = {r["doc_id"]: r["val"] for r in t.read().collect()}
    assert got["k1"] == 111  # rival's commit survived the rebase
    assert got["k2"] == 222  # ours landed on top of it
    assert t.is_committed(7) and t.is_committed(8)


def test_same_batch_conflict_becomes_skip(spark, tmp_path):
    t = mk(spark, str(tmp_path / "t"))
    t2 = ManifestParquetTable(spark, t.path)

    def rival():
        # the OTHER writer applies the SAME batch first
        t2.merge(events(spark, [("k3", "U", 300, 333)]), batch_id=9)

    _conflict_once(t, spark, rival=rival)
    eng = CdcEngine(spark, t)
    m = eng.apply_batch(events(spark, [("k3", "U", 300, 333)]), batch_id=9)
    assert m.skipped
    assert {r["val"] for r in t.read().filter("doc_id = 'k3'").collect()} == {333}


def test_retries_exhausted_raises(spark, tmp_path):
    t = mk(spark, str(tmp_path / "t"))
    _conflict_once(t, spark, n=100)
    eng = CdcEngine(spark, t, occ_retries=1)
    with pytest.raises(CommitConflictError):
        eng.apply_batch(events(spark, [("k4", "U", 400, 4)]), batch_id=10)


def test_genuine_concurrent_writers_race(spark, tmp_path):
    """Two REAL concurrent engines (separate table handles, separate
    threads, disjoint batches) race on the same table: the CAS loser
    rebases and retries, both batches land, final state is the union."""
    import threading

    t0 = mk(spark, str(tmp_path / "t"))
    results, errors = {}, []

    def writer(tag, batch_id, key, lsn):
        try:
            t = ManifestParquetTable(spark, t0.path)
            eng = CdcEngine(spark, t, occ_retries=5)
            m = eng.apply_batch(
                events(spark, [(key, "U", lsn, lsn)]), batch_id=batch_id
            )
            results[tag] = m
        except Exception as e:  # noqa: BLE001
            errors.append((tag, e))

    threads = [
        threading.Thread(target=writer, args=(f"w{i}", 20 + i, f"rk{i}", 500 + i))
        for i in range(3)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    assert len(results) == 3 and not any(m.skipped for m in results.values())
    t0.refresh()
    got = {r["doc_id"]: r["val"] for r in t0.read().collect()}
    assert {f"rk{i}": 500 + i for i in range(3)}.items() <= got.items()
    assert all(t0.is_committed(20 + i) for i in range(3))
