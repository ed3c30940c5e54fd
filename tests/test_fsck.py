"""lake.fsck — the integrity audit must pass on every healthy layout the
engine can produce (CoW, MoR deltas, DVs, mixed-modulus post-split) and
must CATCH each deliberate corruption class: a vanished data file, a
swapped-in wrong-bucket file, and deletion-vector positions out of range."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rap_etl_spark.lake import ManifestParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("val", T.LongType()),
    ]
)


def _mk(spark, path, n=80, mode="cow"):
    t = ManifestParquetTable.create(
        spark, path, SCHEMA, n_buckets=4, merge_mode=mode
    )
    ev = spark.createDataFrame(
        [(f"k{i}", i + 1, i * 2, "U") for i in range(n)],
        T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())]),
    )
    t.merge(ev, batch_id=0)
    return t


def test_fsck_clean_layouts(spark, tmp_path):
    # CoW, MoR with stacked deltas, DV delete, and a metadata-only split
    t = _mk(spark, str(tmp_path / "cow"))
    assert t.fsck()["ok"]

    t2 = _mk(spark, str(tmp_path / "mor"), mode="mor")
    ev = spark.createDataFrame(
        [(f"k{i}", 1000 + i, i, "U") for i in range(0, 40)],
        T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())]),
    )
    t2.merge(ev, batch_id=1)
    t2.delete_where("val < 10", mode="dv", batch_id=2)
    t2.split_buckets(2)
    rep = t2.fsck()
    assert rep["ok"], rep

    # mixed schema versions: the audit's one-scan read must survive files
    # written before AND after an evolve (int64 widening + added column)
    v2 = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("val", T.LongType()),
            T.StructField("extra", T.StringType()),
        ]
    )
    t3 = _mk(spark, str(tmp_path / "evo"))
    t3.evolve(v2)
    ev2 = spark.createDataFrame(
        [("k1", 9001, 7, "x", "U"), ("z9", 9002, 8, "y", "U")],
        T.StructType(v2.fields + [T.StructField("op", T.StringType())]),
    )
    t3.merge(ev2, batch_id=1)
    rep = t3.fsck()
    assert rep["ok"], rep


def test_fsck_catches_missing_file(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    data = os.path.join(str(tmp_path / "t"), "data")
    victim = sorted(
        f for f in os.listdir(data) if f.endswith(".parquet")
    )[0]
    os.remove(os.path.join(data, victim))
    rep = t.fsck()
    assert not rep["ok"]
    assert any(e["check"] == "missing_file" for e in rep["errors"])


def test_fsck_catches_swapped_bucket_file(spark, tmp_path):
    """Replace one bucket's file with another bucket's (simulates an
    external writer routing rows wrong): every surviving row hashes to
    the WRONG bucket and the footer count no longer matches."""
    t = _mk(spark, str(tmp_path / "t"))
    data = os.path.join(str(tmp_path / "t"), "data")
    fs = sorted(f for f in os.listdir(data) if f.endswith(".parquet"))
    assert len(fs) >= 2
    shutil.copyfile(os.path.join(data, fs[0]), os.path.join(data, fs[1]))
    rep = t.fsck()
    assert not rep["ok"]
    checks = {e["check"] for e in rep["errors"]}
    assert "misrouted" in checks
    # the two buckets had different row counts, so footer_rows fires too
    assert "footer_rows" in checks or "dup_live_keys" in checks


def test_fsck_catches_dv_out_of_bounds(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), mode="mor")
    t.delete_where("val < 6", mode="dv", batch_id=1)
    m = t._manifest()
    dv_path = next(
        fe["dv"]["path"] for fe in m["files"] if fe.get("dv")
    )
    full = os.path.join(str(tmp_path / "t"), dv_path)
    dv = spark.read.schema("_dv_file string, _dv_pos long").parquet(full)
    rows = [( r["_dv_file"], 10_000_000) for r in dv.collect()] or [
        ("nonexistent", 10_000_000)
    ]
    doctored = spark.createDataFrame(rows, "_dv_file string, _dv_pos long")
    tmp_out = str(tmp_path / "dvtmp")
    doctored.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = next(
        f for f in os.listdir(tmp_out) if f.endswith(".parquet")
    )
    os.remove(full)
    shutil.copyfile(os.path.join(tmp_out, part), full)
    rep = t.fsck()
    assert not rep["ok"]
    assert any(e["check"] == "dv_bounds" for e in rep["errors"])


def test_fsck_catches_zero_row_truncation(spark, tmp_path):
    """A data file replaced by a VALID but EMPTY parquet produces no scan
    group at all — the manifest-side left join must still fire
    footer_rows (actual=0), the silent-corruption case an inner join
    would pass."""
    t = _mk(spark, str(tmp_path / "t"))
    data = os.path.join(str(tmp_path / "t"), "data")
    victim = sorted(f for f in os.listdir(data) if f.endswith(".parquet"))[0]
    empty = spark.createDataFrame([], SCHEMA)
    out = str(tmp_path / "empty")
    empty.coalesce(1).write.mode("overwrite").parquet(out)
    part = next(f for f in os.listdir(out) if f.endswith(".parquet"))
    os.remove(os.path.join(data, victim))
    shutil.copyfile(os.path.join(out, part), os.path.join(data, victim))
    rep = t.fsck()
    assert not rep["ok"]
    hits = [e for e in rep["errors"] if e["check"] == "footer_rows"]
    assert hits and hits[0]["actual"] == 0 and hits[0]["manifest"] > 0
