"""M0: lake-table layer — round-trip, bucket-CoW merge, idempotent commits,
schema-evolution legality."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rap_etl_spark.lake import ManifestParquetTable, check_evolution
from rap_etl_spark.schemas import DOCS_SCHEMA, DOCS_SCHEMA_V2


def mk_docs(spark, rows):
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def mk_changes(spark, rows):
    schema = T.StructType(
        [T.StructField("op", T.StringType())] + list(DOCS_SCHEMA.fields)
    )
    return spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows], schema=schema
    ).select("doc_id", "op", "tokens", "n_tok", "source")


def test_create_append_read_roundtrip(spark, tmp_path):
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    df = mk_docs(spark, [("doc-1", [1, 2], 2, "s0"), ("doc-2", [3], 1, "s1")])
    info = t.append(df, batch_id=0)
    assert not info.skipped and info.rows_written == 2
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert got["doc-1"]["tokens"] == [1, 2]
    assert got["doc-2"]["n_tok"] == 1


def test_merge_upsert_delete(spark, tmp_path):
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    t.append(mk_docs(spark, [("doc-1", [1], 1, "s0"), ("doc-2", [2], 1, "s0"),
                             ("doc-3", [3], 1, "s0")]), batch_id=0)
    changes = mk_changes(
        spark,
        [
            ("U", "doc-1", [9, 9], 2, "s9"),   # update
            ("D", "doc-2", None, None, None),  # delete
            ("I", "doc-4", [4], 1, "s4"),      # insert
        ],
    )
    info = t.merge(changes, batch_id=1)
    assert not info.skipped
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert set(got) == {"doc-1", "doc-3", "doc-4"}
    assert got["doc-1"]["tokens"] == [9, 9] and got["doc-1"]["source"] == "s9"
    assert got["doc-3"]["tokens"] == [3]  # untouched bucket survives


def test_idempotent_double_commit(spark, tmp_path):
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    changes = mk_changes(spark, [("I", "doc-1", [1], 1, "s0")])
    i1 = t.merge(changes, batch_id=7)
    sid = t.snapshot_id()
    i2 = t.merge(changes, batch_id=7)  # redelivery
    assert i2.skipped
    assert t.snapshot_id() == sid  # no new snapshot
    assert t.read().count() == 1
    # ledger remembers the original commit
    assert t.committed_batches()["7"]["snapshot_id"] == i1.snapshot_id


def test_snapshot_time_travel(spark, tmp_path):
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    t.merge(mk_changes(spark, [("I", "doc-1", [1], 1, "s0")]), batch_id=0)
    sid1 = t.snapshot_id()
    t.merge(mk_changes(spark, [("U", "doc-1", [2], 1, "s0")]), batch_id=1)
    assert t.read().first()["tokens"] == [2]
    assert t.read(snapshot_id=sid1).first()["tokens"] == [1]


def test_evolution_rules():
    check_evolution(DOCS_SCHEMA, DOCS_SCHEMA_V2)  # widen + add nullable: ok
    with pytest.raises(ValueError):
        check_evolution(DOCS_SCHEMA_V2, DOCS_SCHEMA)  # narrowing: no
    bad = T.StructType([*DOCS_SCHEMA.fields, T.StructField("x", T.StringType(), False)])
    with pytest.raises(ValueError):
        check_evolution(DOCS_SCHEMA, bad)  # non-nullable add: no


def test_evolve_old_files_readable(spark, tmp_path):
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    t.append(mk_docs(spark, [("doc-1", [1, 2], 2, "s0")]), batch_id=0)
    t.evolve(DOCS_SCHEMA_V2)
    assert t.schema() == DOCS_SCHEMA_V2
    row = t.read().first()
    assert row["tokens"] == [1, 2] and row["lang"] is None  # old file, cast up
    # write evolved data alongside
    df2 = spark.createDataFrame([("doc-2", [10], 1, "s1", "en")], schema=DOCS_SCHEMA_V2)
    t.append(df2, batch_id=1)
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert got["doc-2"]["lang"] == "en"
    assert got["doc-1"]["lang"] is None
    assert t.read().schema["n_tok"].dataType.simpleString() == "bigint"


def test_merge_only_rewrites_affected_buckets(spark, tmp_path):
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    rows = [(f"doc-{i}", [i], 1, "s0") for i in range(50)]
    t.append(mk_docs(spark, rows), batch_id=0)
    files_before = {fe["path"]: fe for fe in t._manifest()["files"]}
    t.merge(mk_changes(spark, [("U", "doc-1", [99], 1, "s0")]), batch_id=1)
    files_after = {fe["path"]: fe for fe in t._manifest()["files"]}
    kept = set(files_before) & set(files_after)
    # the single changed key touches exactly one bucket; others keep files
    changed_buckets = {files_before[p]["bucket"] for p in set(files_before) - kept}
    assert len(changed_buckets) == 1
    assert len(kept) > 0


def test_lookup_reads_only_key_buckets(spark, tmp_path):
    """Point lookup prunes to the requested keys' buckets and returns
    exactly the live rows for those keys."""
    from rap_etl_spark.schemas import DOCS_SCHEMA

    t = ManifestParquetTable.create(spark, str(tmp_path / "lk"), DOCS_SCHEMA, n_buckets=16)
    rows = [(f"doc-{i}", [i], 1, "s") for i in range(300)]
    t.append(spark.createDataFrame(rows, DOCS_SCHEMA), batch_id=0)

    got = t.lookup(["doc-7", "doc-123", "doc-no-such"]).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in got] == ["doc-123", "doc-7"]
    assert [list(r["tokens"]) for r in got] == [[123], [7]]

    # pruning: the file set actually read is a strict subset of the table
    m = t._manifest()
    kdf = spark.createDataFrame([("doc-7",), ("doc-123",)], "doc_id string")
    buckets = {
        r["_b"] for r in kdf.select(t._bucket_expr("doc_id").alias("_b")).collect()
    }
    pruned = [fe for fe in m["files"] if fe["bucket"] in buckets]
    assert 0 < len(pruned) < len(m["files"])


def test_append_enforces_one_row_per_key(spark, tmp_path):
    """The merge reduction relies on at-most-one-row-per-key; append must
    not be able to break it (ADVICE r1): in-batch duplicates are reduced
    deterministically, key overlap with stored data raises."""
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    dup = mk_docs(
        spark,
        [("doc-1", [1], 1, "s0"), ("doc-1", [2], 1, "s1"), ("doc-2", [3], 1, "s0")],
    )
    t.append(dup, batch_id=0)
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert set(got) == {"doc-1", "doc-2"}  # one survivor per key

    with pytest.raises(ValueError, match="duplicate existing key"):
        t.append(mk_docs(spark, [("doc-2", [9], 1, "s9")]), batch_id=1)
    # disjoint keys still append fine
    t.append(mk_docs(spark, [("doc-3", [9], 1, "s9")]), batch_id=2)
    assert t.read().count() == 3
    # and a later merge keeps exact per-key state (no multiplied rows)
    t.merge(mk_changes(spark, [("U", "doc-1", [7, 7], 2, "s7")]), batch_id=3)
    rows = t.read().filter(F.col("doc_id") == "doc-1").collect()
    assert len(rows) == 1 and rows[0]["tokens"] == [7, 7]


def test_ledger_pruning_keeps_idempotency(spark, tmp_path):
    """prune_ledger truncates per-batch entries below the horizon but
    redelivered pruned batches still skip (O(1) horizon check)."""
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    for b in range(5):
        t.merge(mk_changes(spark, [("I", f"doc-{b}", [b], 1, "s")]), batch_id=b)
    assert len(t.committed_batches()) == 5
    removed = t.prune_ledger(horizon_batch_id=2)
    assert removed == 3
    assert set(t.committed_batches()) == {"3", "4"}
    assert t.ledger_horizon() == 2
    # pruned batch redelivery is still a no-op
    sid = t.snapshot_id()
    info = t.merge(mk_changes(spark, [("I", "doc-0", [99], 1, "x")]), batch_id=1)
    assert info.skipped and t.snapshot_id() == sid
    assert t.read().filter(F.col("doc_id") == "doc-0").first()["tokens"] == [0]
    # horizon never regresses
    t.prune_ledger(horizon_batch_id=1)
    assert t.ledger_horizon() == 2
    # compact can prune in the same commit
    t.merge(mk_changes(spark, [("I", "doc-9", [9], 1, "s")]), batch_id=9)
    t.compact(ledger_horizon_batch_id=9)
    assert t.committed_batches() == {} and t.ledger_horizon() == 9
    assert t.is_committed(4) and t.is_committed(9) and not t.is_committed(10)


def test_rebucket_evolution(spark, tmp_path):
    """Bucket-count evolution: one rewrite, state preserved, new layout
    used by subsequent merges/lookups/diffs, old snapshots still readable."""
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    t.append(
        mk_docs(spark, [(f"doc-{i}", [i], 1, "s") for i in range(40)]), batch_id=0
    )
    sid_before = t.snapshot_id()
    before = sorted(r["doc_id"] for r in t.read().collect())

    info = t.rebucket(16)
    assert not info.skipped
    assert t.n_buckets() == 16
    assert sorted(r["doc_id"] for r in t.read().collect()) == before
    assert {fe["bucket"] for fe in t._manifest()["files"]} <= set(range(16))
    # old snapshot still readable under its own layout
    assert t.read(snapshot_id=sid_before).count() == 40
    # rebucket is layout-only: no logical change rows
    assert t.table_changes(sid_before).count() == 0
    # merges keep working against the new layout
    t.merge(mk_changes(spark, [("U", "doc-3", [99], 1, "s")]), batch_id=1)
    assert t.lookup(["doc-3"]).first()["tokens"] == [99]
    # no-op when the count is unchanged
    assert t.rebucket(16).skipped


def test_compact_sorted_layout(spark, tmp_path):
    """compact(sort_cols=...) preserves state and lays each bucket's file
    out in sort order (row-group stats become selective)."""
    import os

    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=2)
    t.append(
        mk_docs(spark, [(f"doc-{i:03d}", [i], 1, "s") for i in range(50)]),
        batch_id=0,
    )
    before = sorted(map(tuple, t.read().collect()))
    t.compact(sort_cols=["doc_id"])
    assert sorted(map(tuple, t.read().collect())) == before
    for fe in t._manifest()["files"]:
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(
                os.path.join(str(tmp_path / "t"), fe["path"])
            ).collect()
        ]
        assert ids == sorted(ids)


def test_expire_snapshots_sweeps_orphans(spark, tmp_path):
    """Data files from crashed/conflicted commits (referenced by no
    manifest) are garbage-collected by expire_snapshots once past the
    grace window (ADVICE r1)."""
    import os

    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    t.append(mk_docs(spark, [("doc-1", [1], 1, "s")]), batch_id=0)
    # simulate a crashed commit: a data file exists but no manifest knows it
    orphan = os.path.join(str(tmp_path / "t"), "data", "b00000-deadbeef-0000.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not-a-real-parquet")
    # grace window protects fresh files (in-flight commits)
    t.expire_snapshots(keep=3, orphan_grace_sec=3600)
    assert os.path.exists(orphan)
    deleted = t.expire_snapshots(keep=3, orphan_grace_sec=0.0)
    assert deleted >= 1
    assert not os.path.exists(orphan)
    # live data untouched
    assert t.read().count() == 1
