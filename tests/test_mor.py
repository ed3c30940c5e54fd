"""Merge-on-read mode (lake.py `merge(mode="mor")` + `_read_resolved`):
MoR and CoW must be observationally identical — same final state, same
time-travel states, same table_changes — while MoR merges touch no
existing file. SURVEY.md §2.1 C4 write-mode extension."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rap_etl_spark.lake import ManifestParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def mk_changes(spark, rows):
    """rows: (doc_id, op, lsn, val)"""
    return spark.createDataFrame(
        rows, "doc_id string, op string, lsn long, val long"
    )


def state(t):
    return {
        r["doc_id"]: (r["val"],) for r in t.read().select("doc_id", "val").collect()
    }


BATCHES = [
    # batch 0: inserts + an update at lsn 5
    [("a", "U", 1, 10), ("b", "U", 2, 20), ("c", "U", 5, 50)],
    # batch 1: out-of-order older event for c (must lose), delete b,
    # new key d
    [("c", "U", 3, 30), ("b", "D", 6, None), ("d", "U", 7, 70)],
    # batch 2: resurrect-attempt on b with an OLDER lsn (must stay dead),
    # update a, re-delivery of d's exact row (idempotent per event)
    [("b", "U", 4, 40), ("a", "U", 8, 11), ("d", "U", 7, 70)],
]

EXPECT = {"a": (11,), "c": (50,), "d": (70,)}


def replay(spark, path, mode):
    t = ManifestParquetTable.create(spark, path, SCHEMA, n_buckets=4, merge_mode=mode)
    for i, rows in enumerate(BATCHES):
        t.merge(mk_changes(spark, rows), batch_id=i)
    return t


def test_mor_final_state_equals_cow(spark, tmp_path):
    cow = replay(spark, str(tmp_path / "cow"), "cow")
    mor = replay(spark, str(tmp_path / "mor"), "mor")
    assert state(cow) == state(mor) == EXPECT


def test_mor_merge_touches_no_existing_file(spark, tmp_path):
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, merge_mode="mor"
    )
    t.merge(mk_changes(spark, BATCHES[0]), batch_id=0)
    before = {fe["path"] for fe in t._manifest()["files"]}
    t.merge(mk_changes(spark, BATCHES[1]), batch_id=1)
    after = {fe["path"] for fe in t._manifest()["files"]}
    assert before <= after  # nothing rewritten or dropped
    assert all(
        fe.get("kind") == "delta" for fe in t._manifest()["files"]
    )  # no base was ever created: empty table + two MoR merges
    assert t.delta_depth()  # at least one dirty bucket


def test_mor_idempotent_recommit(spark, tmp_path):
    t = replay(spark, str(tmp_path / "t"), "mor")
    n_files = len(t._manifest()["files"])
    info = t.merge(mk_changes(spark, BATCHES[1]), batch_id=1)
    assert info.skipped
    assert len(t._manifest()["files"]) == n_files
    assert state(t) == EXPECT


def test_mor_time_travel(spark, tmp_path):
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, merge_mode="mor"
    )
    sids = []
    for i, rows in enumerate(BATCHES):
        sids.append(t.merge(mk_changes(spark, rows), batch_id=i).snapshot_id)
    # snapshot after batch 1: a=10, c=50 (lsn3 lost), b deleted, d=70
    got = {
        r["doc_id"]: r["val"]
        for r in t.read(snapshot_id=sids[1]).select("doc_id", "val").collect()
    }
    assert got == {"a": 10, "c": 50, "d": 70}


def test_materialize_deltas_preserves_state(spark, tmp_path):
    t = replay(spark, str(tmp_path / "t"), "mor")
    assert t.delta_depth()
    before = state(t)
    info = t.materialize_deltas()
    assert not info.skipped
    assert t.delta_depth() == {}
    assert state(t) == before == EXPECT
    # tombstone for b must survive materialization (anti-resurrection)
    meta = t._read_resolved(t._manifest()["files"], t.schema(), with_meta=True)
    dead = meta.filter(F.col("_del") & (F.col("doc_id") == "b")).count()
    assert dead == 1
    # a later even-older b event still loses to the kept tombstone
    t.merge(mk_changes(spark, [("b", "U", 1, 99)]), batch_id=10)
    assert "b" not in state(t)


def test_cow_merge_materializes_dirty_buckets(spark, tmp_path):
    """A CoW-mode merge over buckets holding MoR deltas doubles as their
    materialization: affected buckets come out pure-base."""
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=1, merge_mode="mor"
    )
    t.merge(mk_changes(spark, BATCHES[0]), batch_id=0)
    t.merge(mk_changes(spark, BATCHES[1]), batch_id=1)
    assert t.delta_depth()
    t.merge(mk_changes(spark, BATCHES[2]), batch_id=2, mode="cow")
    assert t.delta_depth() == {}  # single bucket, so fully clean
    assert state(t) == EXPECT


def test_mor_schema_evolution(spark, tmp_path):
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, merge_mode="mor"
    )
    t.merge(mk_changes(spark, BATCHES[0]), batch_id=0)
    v2 = T.StructType(
        list(SCHEMA.fields) + [T.StructField("extra", T.StringType(), True)]
    )
    t.evolve(v2)
    ch = spark.createDataFrame(
        [("a", "U", 9, 12, "x")],
        "doc_id string, op string, lsn long, val long, extra string",
    )
    t.merge(ch, batch_id=1)
    got = {r["doc_id"]: (r["val"], r["extra"]) for r in t.read().collect()}
    assert got["a"] == (12, "x")
    assert got["b"] == (20, None)  # old delta file read-time upcast


def test_mor_table_changes_match_cow(spark, tmp_path):
    cow = ManifestParquetTable.create(
        spark, str(tmp_path / "cow"), SCHEMA, n_buckets=4, merge_mode="cow"
    )
    mor = ManifestParquetTable.create(
        spark, str(tmp_path / "mor"), SCHEMA, n_buckets=4, merge_mode="mor"
    )
    snaps = {}
    for name, t in (("cow", cow), ("mor", mor)):
        sids = [t.snapshot_id()]
        for i, rows in enumerate(BATCHES):
            sids.append(t.merge(mk_changes(spark, rows), batch_id=i).snapshot_id)
        snaps[name] = sids

    def changes(t, frm, to):
        return {
            (r["doc_id"], r["_change_type"], r["val"])
            for r in t.table_changes(frm, to).collect()
        }

    for i in range(len(BATCHES)):
        assert changes(cow, snaps["cow"][i], snaps["cow"][i + 1]) == changes(
            mor, snaps["mor"][i], snaps["mor"][i + 1]
        ), f"batch {i} diff mismatch"


def test_mor_lookup(spark, tmp_path):
    t = replay(spark, str(tmp_path / "t"), "mor")
    got = {r["doc_id"]: r["val"] for r in t.lookup(["a", "b", "c"]).collect()}
    assert got == {"a": 11, "c": 50}


def test_set_merge_mode_flips_default(spark, tmp_path):
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), SCHEMA, n_buckets=2)
    assert t.merge_mode() == "cow"
    t.set_merge_mode("mor")
    assert t.merge_mode() == "mor"
    t.merge(mk_changes(spark, BATCHES[0]), batch_id=0)
    assert all(fe.get("kind") == "delta" for fe in t._manifest()["files"])
    with pytest.raises(ValueError):
        t.set_merge_mode("nope")


def test_zone_map_pruning_after_sorted_compact(spark, tmp_path):
    """Commit-time parquet-footer key bounds + lookup-side file skipping:
    after a sorted compaction the bounds are recorded, and a point lookup
    keeps only files whose [min_key, max_key] can contain a requested
    key."""
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=2
    )
    rows = [(f"doc-{i:04d}", "U", i + 1, i * 10) for i in range(200)]
    t.merge(mk_changes(spark, rows), batch_id=0)
    # size-bounded sorted files -> contiguous key ranges per file
    t.compact(sort_cols=["doc_id"], max_rows_per_file=30)
    files = t._manifest()["files"]
    assert len(files) > 2  # buckets actually split into multiple files
    assert all("min_key" in fe and "max_key" in fe for fe in files)
    pruned = t._prune_files_by_key(files, ["doc-0005"])
    # one surviving file per bucket at most
    assert len(pruned) <= t.n_buckets() < len(files)
    got = {r["doc_id"]: r["val"] for r in t.lookup(["doc-0005", "doc-0190"]).collect()}
    assert got == {"doc-0005": 50, "doc-0190": 1900}
    # a key outside every file's bounds prunes everything in its bucket
    assert t.lookup(["zzz-none"]).count() == 0


def test_engine_auto_materialize_bounds_depth(spark, tmp_path):
    from rap_etl_spark.engine import CdcEngine

    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=2, merge_mode="mor"
    )
    eng = CdcEngine(spark, t, count_input=False, auto_materialize_depth=2)
    max_seen = 0
    for i, rows in enumerate(BATCHES * 2):
        eng.apply_batch(
            spark.createDataFrame(rows, "doc_id string, op string, lsn long, val long")
            .withColumn("lsn", F.col("lsn") + F.lit(i * 100)),
            batch_id=i,
        )
        depth = t.delta_depth()
        max_seen = max([max_seen, *depth.values()]) if depth else max_seen
        assert all(d < 2 for d in depth.values()), f"depth ran away: {depth}"
    assert max_seen >= 1  # deltas did stack before being folded
    # final state equals a CoW replay of the same batches
    cow = ManifestParquetTable.create(spark, str(tmp_path / "c"), SCHEMA, n_buckets=2)
    ec = CdcEngine(spark, cow, count_input=False)
    for i, rows in enumerate(BATCHES * 2):
        ec.apply_batch(
            spark.createDataFrame(rows, "doc_id string, op string, lsn long, val long")
            .withColumn("lsn", F.col("lsn") + F.lit(i * 100)),
            batch_id=i,
        )
    assert state(t) == state(cow)
