"""Lake maintenance: compaction, tombstone GC, snapshot expiry, history."""

import os

from pyspark.sql import functions as F

from rap_etl_spark.engine import CdcEngine, replay_log
from rap_etl_spark.lake import META_DEL, ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.synth import synthesize_events, write_event_log

from .oracle import assert_frames_equal, naive_final_state

N = 3000


def _replayed_table(spark, sf_small, tmp_path, n_batches=5):
    ev = synthesize_events(spark, sf_small, N, max_tok=8)
    write_event_log(ev, str(tmp_path / "log"), n_batches=n_batches, n_events=N)
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    replay_log(spark, t, str(tmp_path / "log"))
    return t, str(tmp_path / "log")


def test_compact_preserves_state_and_merges_files(spark, sf_small, tmp_path):
    t, log = _replayed_table(spark, sf_small, tmp_path)
    before = t.read().toPandas()
    files_before = len(t._manifest()["files"])
    t.compact()
    files_after = len(t._manifest()["files"])
    assert files_after <= 8  # one file per bucket
    # merges already hash-cluster writes, so steady state is one file per
    # bucket; compaction must never exceed it
    assert files_after <= files_before
    assert_frames_equal(t.read().toPandas(), naive_final_state(
        spark.read.parquet(log).toPandas()))
    assert len(before) == t.read().count()


def test_tombstone_gc_horizon(spark, sf_small, tmp_path):
    t, log = _replayed_table(spark, sf_small, tmp_path)
    m = t._manifest()
    tomb_before = (
        t._read_files(m["files"], t.schema(), with_meta=True)
        .filter(F.col(META_DEL))
        .count()
    )
    assert tomb_before > 0  # the Zipf log contains deletes
    t.compact(tombstone_horizon_lsn=N)  # all LSNs are final -> GC everything
    m2 = t._manifest()
    tomb_after = (
        t._read_files(m2["files"], t.schema(), with_meta=True)
        .filter(F.col(META_DEL))
        .count()
    )
    assert tomb_after == 0
    # live state unchanged
    assert_frames_equal(t.read().toPandas(), naive_final_state(
        spark.read.parquet(log).toPandas()))


def test_merge_after_compaction_still_correct(spark, sf_small, tmp_path):
    """Compaction + GC must not let an old event resurrect state applied
    at a higher LSN (the horizon argument exists exactly for this)."""
    t, log = _replayed_table(spark, sf_small, tmp_path)
    t.compact(tombstone_horizon_lsn=N)
    # apply a NEW event beyond every prior LSN: normal upsert still works
    ch = spark.createDataFrame(
        [("doc-1", "U", N + 100, [7, 7], 2, "sX")],
        "doc_id string, op string, lsn long, tokens array<int>, n_tok int, source string",
    )
    t.merge(ch, batch_id=777)
    row = t.read().filter(F.col("doc_id") == "doc-1").first()
    assert row is not None and row["tokens"] == [7, 7]


def test_expire_snapshots(spark, sf_small, tmp_path):
    t, _ = _replayed_table(spark, sf_small, tmp_path)
    hist_before = t.history()
    assert len(hist_before) >= 6  # create + 5 batches
    n_deleted = t.expire_snapshots(keep=2)
    hist_after = t.history()
    assert len(hist_after) == 2
    assert n_deleted >= 0
    # current snapshot still reads fine
    assert t.read().count() > 0
    # time travel to an expired snapshot now fails cleanly
    expired = [h for h in hist_before if h["snapshot_id"] not in
               {x["snapshot_id"] for x in hist_after}][0]
    try:
        t.read(snapshot_id=expired["snapshot_id"]).count()
        raised = False
    except Exception:
        raised = True
    assert raised


def test_history_lineage(spark, sf_small, tmp_path):
    t, _ = _replayed_table(spark, sf_small, tmp_path, n_batches=3)
    hist = t.history()
    # parent chain is consistent newest -> oldest
    by_sid = {h["snapshot_id"]: h for h in hist}
    for h in hist:
        if h["parent"] is not None:
            assert h["parent"] in by_sid
    assert hist[0]["snapshot_id"] == t.snapshot_id()


def test_compact_buckets_targeted(spark, tmp_path):
    """Bucket-scoped binpack: selected buckets' fragments merge to one
    file; unselected buckets' FILE PATHS are untouched by the commit."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable

    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("val", T.LongType())]
    )
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), schema, n_buckets=4)
    for b in range(4):
        t.append(
            spark.createDataFrame(
                [(f"k{b}-{i}", b * 10 + i) for i in range(8)],
                "doc_id string, val long",
            ),
            batch_id=b,
            assume_unique=True,
        )
    per = t.files_per_bucket()
    assert max(per.values()) >= 2  # fragments accumulated
    target = {b for b, n in per.items() if n >= 2}
    before = {fe["path"] for fe in t._manifest()["files"] if fe["bucket"] not in target}
    state_before = {r["doc_id"]: r["val"] for r in t.read().collect()}
    t.compact_buckets(target)
    after_per = t.files_per_bucket()
    assert all(after_per[b] == 1 for b in target)
    untouched = {fe["path"] for fe in t._manifest()["files"] if fe["bucket"] not in target}
    assert untouched == before  # no collateral rewrite
    assert {r["doc_id"]: r["val"] for r in t.read().collect()} == state_before
    # no-op when selection has no files
    assert t.compact_buckets({99}).skipped


def test_engine_auto_compact_bounds_files(spark, tmp_path):
    """auto_compact_files: fragment count per bucket stays bounded across
    many small batches, and replayed state is exact."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import CdcEngine
    from rap_etl_spark.lake import ManifestParquetTable

    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("val", T.LongType())]
    )
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), schema, n_buckets=2)
    eng = CdcEngine(spark, t, auto_compact_files=3)
    for b in range(8):
        ev = spark.createDataFrame(
            [(f"k{b}-{i}", "U", b * 100 + i, i) for i in range(4)],
            "doc_id string, op string, lsn long, val long",
        )
        eng.apply_batch(ev, batch_id=b)
    assert max(t.files_per_bucket().values()) < 3 + 1
    assert t.read().count() == 32
    assert t.fast_count() == 32
