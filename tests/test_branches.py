"""Write-audit-publish branches (lake.create_branch/publish_branch):
staged commits are invisible to main, publish is an atomic fast-forward
CAS, the batch ledger rides along, and abandoned branches are reclaimed."""

import json
import os
import time

import pytest
from pyspark.sql import types as T

from rap_etl_spark.lake import CommitConflictError, ManifestParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def mk(spark, path):
    return ManifestParquetTable.create(spark, str(path), SCHEMA, n_buckets=2)


def chg(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, op string, lsn long, v long")


def test_wap_stage_audit_publish(spark, tmp_path):
    t = mk(spark, tmp_path / "t")
    t.merge(chg(spark, [("a", "U", 1, 1)]), batch_id=0)
    br = t.create_branch("audit-1")
    br.merge(chg(spark, [("b", "U", 2, 2), ("a", "U", 3, 30)]), batch_id=1)
    # staged: branch sees both keys, main still sees only the old state
    assert br.read().count() == 2
    assert [tuple(r) for r in t.read().collect()] == [("a", 1)]
    assert t.list_branches()["audit-1"]["base"] == t.snapshot_id()
    # audit passed -> publish: main fast-forwards atomically
    t.publish_branch("audit-1")
    rows = {r["doc_id"]: r["v"] for r in t.read().collect()}
    assert rows == {"a": 30, "b": 2}
    assert t.list_branches() == {}
    # exactly-once across the hop: the staged batch's ledger published too
    assert t.is_committed(1)
    info = t.merge(chg(spark, [("b", "U", 2, 2)]), batch_id=1)
    assert info.skipped


def test_publish_conflict_when_main_advances(spark, tmp_path):
    t = mk(spark, tmp_path / "t")
    t.create_branch("wap")
    t.branch("wap").merge(chg(spark, [("a", "U", 1, 1)]), batch_id=0)
    t.merge(chg(spark, [("z", "U", 9, 9)]), batch_id=7)  # main moves on
    with pytest.raises(CommitConflictError, match="main moved"):
        t.publish_branch("wap")
    # branch still intact for inspection / re-staging
    assert t.branch("wap").read().count() == 1
    t.drop_branch("wap")


def test_branch_handles_are_independent_occ_domains(spark, tmp_path):
    t = mk(spark, tmp_path / "t")
    t.create_branch("b1")
    b1 = t.branch("b1")
    # commits on main and on the branch interleave without conflicting —
    # each CASes against its own pointer
    t.merge(chg(spark, [("m", "U", 1, 1)]), batch_id=0)
    b1.merge(chg(spark, [("s", "U", 1, 1)]), batch_id=0)
    t.merge(chg(spark, [("m2", "U", 2, 2)]), batch_id=1)
    assert t.read().count() == 2
    assert b1.read().count() == 1


def test_drop_branch_files_reclaimed_and_heads_pinned(spark, tmp_path):
    t = mk(spark, tmp_path / "t")
    for i in range(5):
        t.merge(chg(spark, [(f"k{i}", "U", i + 1, i)]), batch_id=i)
    br = t.create_branch("stage")
    br.merge(chg(spark, [("x", "U", 99, 99)]), batch_id=99)
    head = br.snapshot_id()
    # expire aggressively: the live branch head (old seq or not) is pinned
    t.expire_snapshots(keep=1, orphan_grace_sec=3600)
    assert os.path.exists(
        os.path.join(t.path, "manifests", f"manifest-{head}.json")
    )
    assert t.branch("stage").read().count() == 6
    staged_files = {
        fe["path"] for fe in t.branch("stage")._manifest()["files"]
    } - {fe["path"] for fe in t._manifest()["files"]}
    assert staged_files
    t.drop_branch("stage")
    # age the orphans AND the dead head manifest past the grace window
    # (in-flight-commit protection works on mtime), then sweep
    aged = (time.time() - 7200, time.time() - 7200)
    for rel in staged_files:
        os.utime(os.path.join(t.path, rel), aged)
    os.utime(os.path.join(t.path, "manifests", f"manifest-{head}.json"), aged)
    # the dropped head manifest must not pin its files anymore — expire
    # deletes the manifest (not in keep window) and then the orphans
    t.expire_snapshots(keep=1, orphan_grace_sec=3600)
    for rel in staged_files:
        assert not os.path.exists(os.path.join(t.path, rel))
    assert t.read().count() == 5  # main untouched


def test_branch_validation_and_missing(spark, tmp_path):
    t = mk(spark, tmp_path / "t")
    with pytest.raises(ValueError):
        t.create_branch("main")
    with pytest.raises(ValueError):
        t.create_branch("bad/name")
    with pytest.raises(FileNotFoundError):
        t.branch("nope")
    with pytest.raises(FileNotFoundError):
        t.publish_branch("nope")
    t.create_branch("dup")
    with pytest.raises(FileExistsError):
        t.create_branch("dup")


def test_constraint_gates_staged_commit(spark, tmp_path):
    # the WAP point: a bad batch dies on the branch, main never sees it
    from rap_etl_spark.lake import ConstraintViolationError

    t = mk(spark, tmp_path / "t")
    t.set_constraint("v_pos", "v > 0")
    br = t.create_branch("wap")
    with pytest.raises(ConstraintViolationError):
        br.merge(chg(spark, [("a", "U", 1, -1)]), batch_id=0)
    br.merge(chg(spark, [("a", "U", 2, 5)]), batch_id=1)
    t.publish_branch("wap")
    assert [tuple(r) for r in t.read().collect()] == [("a", 5)]
