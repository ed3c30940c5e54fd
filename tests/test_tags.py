"""Immutable snapshot tags (lake.py): pinned retention through
expire_snapshots, exact historical reads, immutability, and the
multi-column read_where extension."""

import pytest
from pyspark.sql import types as T

from rap_etl_spark.lake import ManifestParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("grp", T.StringType()),
    ]
)


def mk(spark, path):
    t = ManifestParquetTable.create(spark, path, SCHEMA, n_buckets=2)
    t.append(
        spark.createDataFrame(
            [(f"k{i:03d}", i, "a" if i % 2 else "b") for i in range(100)],
            "doc_id string, val long, grp string",
        ),
        batch_id=0,
        assume_unique=True,
    )
    return t


def _bump(t, spark, n):
    for b in range(1, n + 1):
        t.append(
            spark.createDataFrame(
                [(f"x{b}", 1000 + b, "a")], "doc_id string, val long, grp string"
            ),
            batch_id=b,
            assume_unique=True,
        )


def test_tag_pins_snapshot_through_expire(spark, tmp_path):
    t = mk(spark, str(tmp_path / "t"))
    sid = t.create_tag("release")
    _bump(t, spark, 4)
    t.compact()
    deleted = t.expire_snapshots(keep=1, orphan_grace_sec=0)
    assert deleted > 0  # retention really ran
    # tagged state still exactly reproducible
    assert t.read_tag("release").count() == 100
    assert t.read(snapshot_id=sid).count() == 100
    # untagged old snapshots are gone
    hist = [h["snapshot_id"] for h in t.history()]
    assert sid in hist and len(hist) <= 4


def test_tag_dropped_then_reclaimed(spark, tmp_path):
    t = mk(spark, str(tmp_path / "t"))
    sid = t.create_tag("tmp")
    _bump(t, spark, 2)
    t.compact()
    t.drop_tag("tmp")
    t.expire_snapshots(keep=1, orphan_grace_sec=0)
    with pytest.raises(ValueError, match="expired or never existed"):
        t.read(snapshot_id=sid).count()


def test_tag_immutable_and_validated(spark, tmp_path):
    t = mk(spark, str(tmp_path / "t"))
    t.create_tag("v1")
    with pytest.raises(FileExistsError):
        t.create_tag("v1")
    with pytest.raises(ValueError):
        t.create_tag("main")
    with pytest.raises(ValueError):
        t.drop_tag("nope")
    with pytest.raises(ValueError):
        t.create_tag("ok", snapshot_id="00000099-deadbeef0000")
    assert t.list_tags() == {"v1": t.snapshot_id()}


def test_read_where_multi_column(spark, tmp_path):
    t = mk(spark, str(tmp_path / "t"))
    t.compact(sort_cols=["val"], max_rows_per_file=20)
    df = t.read_where({"val": (10, 30), "grp": ("a", "a")})
    rows = sorted(r["val"] for r in df.collect())
    assert rows == list(range(11, 30, 2))  # odd vals are grp 'a'
    total = len(t._manifest()["files"])
    assert 0 < len(df.inputFiles()) < total
