"""Zero-copy hard-linked table clone (lake.py clone): snapshot fidelity,
writer independence, and GC safety when the source deletes its files."""

import os

import pytest
from pyspark.sql import types as T

from rap_etl_spark.lake import ManifestParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("src", T.StringType()),
    ]
)


def mk(spark, path):
    t = ManifestParquetTable.create(spark, path, SCHEMA, n_buckets=4)
    t.append(
        spark.createDataFrame(
            [(f"k{i}", i, "s") for i in range(30)],
            "doc_id string, val long, src string",
        ),
        batch_id=0,
        assume_unique=True,
    )
    return t


def state(t):
    return {r["doc_id"]: r["val"] for r in t.read().collect()}


def test_clone_matches_and_links(spark, tmp_path):
    t = mk(spark, str(tmp_path / "src"))
    c = t.clone(str(tmp_path / "dst"))
    assert state(c) == state(t)
    # hard links: same inode, no data bytes copied
    fe = t._manifest()["files"][0]
    s1 = os.stat(os.path.join(t.path, fe["path"]))
    s2 = os.stat(os.path.join(c.path, fe["path"]))
    assert s1.st_ino == s2.st_ino and s1.st_nlink >= 2
    # ledger carried: redelivery is a no-op on the clone too
    assert c.is_committed(0)
    with pytest.raises(FileExistsError):
        t.clone(str(tmp_path / "dst"))


def test_clone_writer_independence(spark, tmp_path):
    t = mk(spark, str(tmp_path / "src"))
    c = t.clone(str(tmp_path / "dst"))
    ch = spark.createDataFrame(
        [("k1", "U", 100, 999, "s"), ("new", "U", 101, 1, "s")],
        "doc_id string, op string, lsn long, val long, src string",
    )
    c.merge(ch, batch_id=1)
    assert state(c)["k1"] == 999 and "new" in state(c)
    assert state(t)["k1"] == 1 and "new" not in state(t)
    t.delete_where("val < 10")
    assert len(state(t)) == 20
    assert state(c)["k1"] == 999  # clone untouched by source DML


def test_clone_survives_source_gc(spark, tmp_path):
    t = mk(spark, str(tmp_path / "src"))
    c = t.clone(str(tmp_path / "dst"))
    before = state(c)
    # source rewrites everything and expires old snapshots + orphan files
    t.compact()
    t.expire_snapshots(keep=1, orphan_grace_sec=0)
    assert state(c) == before  # inodes survive the source's unlinks


def test_clone_time_travel_snapshot(spark, tmp_path):
    t = mk(spark, str(tmp_path / "src"))
    first = t.snapshot_id()
    t.append(
        spark.createDataFrame([("zz", 1, "s")], "doc_id string, val long, src string"),
        batch_id=1,
        assume_unique=True,
    )
    c = t.clone(str(tmp_path / "dst"), snapshot_id=first)
    assert "zz" not in state(c) and len(state(c)) == 30


def test_clone_copy_mode(spark, tmp_path):
    t = mk(spark, str(tmp_path / "src"))
    c = t.clone(str(tmp_path / "dst"), mode="copy")
    fe = t._manifest()["files"][0]
    s1 = os.stat(os.path.join(t.path, fe["path"]))
    s2 = os.stat(os.path.join(c.path, fe["path"]))
    assert s1.st_ino != s2.st_ino
    assert state(c) == state(t)
    with pytest.raises(ValueError):
        t.clone(str(tmp_path / "dst2"), mode="bogus")
