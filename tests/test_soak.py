"""Long-run soak: many small micro-batches into one table — the shape a
continuous CDC tail produces over days. Asserts (a) the final state stays
oracle-correct across 20 commits, (b) file/manifest growth is linear and
bounded, (c) compact + expire_snapshots returns the table to one file per
occupied bucket with history trimmed, state unchanged."""

import os

from rap_etl_spark.engine import CdcEngine
from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.synth import synthesize_events, write_event_log

from .oracle import assert_frames_equal, naive_final_state

N_EVENTS = 5000
N_BATCHES = 20


def test_twenty_batch_soak_then_compact(spark, sf_small, tmp_path):
    ev = synthesize_events(spark, sf_small, N_EVENTS, max_tok=8, packed=True)
    log = str(tmp_path / "log")
    write_event_log(ev, log, n_batches=N_BATCHES, n_events=N_EVENTS)
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    eng = CdcEngine(spark, t, count_input=False)

    for b in sorted(
        int(d.split("=")[1]) for d in os.listdir(log) if d.startswith("batch=")
    ):
        eng.apply_batch(spark.read.parquet(f"{log}/batch={b}"), batch_id=b)

    # correctness after 20 commits
    arr = synthesize_events(spark, sf_small, N_EVENTS, max_tok=8)
    want = naive_final_state(arr.toPandas())
    assert_frames_equal(t.read().toPandas(), want)

    m = t._manifest()
    n_files_before = len(m["files"])
    # bounded growth: at most one file per (batch, affected bucket)
    assert n_files_before <= N_BATCHES * 8 + 8
    assert len(t.history()) == N_BATCHES + 1  # create + one snapshot per batch

    # maintenance: rewrite to one file per occupied bucket, trim history
    t.compact(tombstone_horizon_lsn=N_EVENTS + 1, expire_snapshots_keep=3)
    m2 = t._manifest()
    assert len(m2["files"]) <= 8
    assert len(t.history()) <= 4  # kept 3 + current
    assert_frames_equal(t.read().toPandas(), want)  # state identical

    # the batch ledger survives compaction: redelivery is still a no-op
    redo = eng.apply_batch(spark.read.parquet(f"{log}/batch=5"), batch_id=5)
    assert redo.skipped

    # metadata stays O(live), not O(history): prune the ledger below the
    # checkpoint-safe horizon and the manifest shrinks to live files +
    # horizon marker while pruned batch ids still skip on redelivery
    import json

    def manifest_bytes():
        sid = t.snapshot_id()
        p = os.path.join(str(tmp_path / "t"), "manifests", f"manifest-{sid}.json")
        return os.path.getsize(p)

    size_with_ledger = manifest_bytes()
    t.compact(ledger_horizon_batch_id=N_BATCHES - 1, expire_snapshots_keep=2)
    assert t.committed_batches() == {}
    assert manifest_bytes() < size_with_ledger
    # manifest size is now a function of bucket count only, not batch count
    m3 = json.load(
        open(os.path.join(str(tmp_path / "t"), "manifests", f"manifest-{t.snapshot_id()}.json"))
    )
    # format 2: the root carries the n_files summary + per-bucket page
    # pointers, never the inline file list
    assert "files" not in m3 and m3["n_files"] <= 8 and m3["committed"] == {}
    redo2 = eng.apply_batch(spark.read.parquet(f"{log}/batch=7"), batch_id=7)
    assert redo2.skipped
    assert_frames_equal(t.read().toPandas(), want)


def test_manifest_bounded_over_200_batch_ledger(spark, tmp_path):
    """Metadata-level 200-commit soak (no data volume — this gates the
    MANIFEST growth law): with periodic ledger pruning, manifest byte size
    is bounded by O(live files + prune window), independent of how many
    batches ever committed."""
    import json

    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    sizes = []
    for b in range(200):
        m = t._manifest()
        nxt = t._next_manifest(m)
        nxt["committed"][str(b)] = {"snapshot_id": nxt["snapshot_id"], "event_count": 1}
        t._write_manifest(nxt)
        if b % 20 == 19:
            t.prune_ledger(horizon_batch_id=b - 5)
            sid = t.snapshot_id()
            p = os.path.join(str(tmp_path / "t"), "manifests", f"manifest-{sid}.json")
            sizes.append(os.path.getsize(p))
    # size after the first prune equals size after the tenth: no growth
    assert max(sizes) - min(sizes) <= 64  # allow id-length jitter
    assert len(t.committed_batches()) <= 6
    assert t.is_committed(0) and t.is_committed(150)


def test_commit_metadata_is_o_touched_buckets(spark, tmp_path):
    """Format-2 manifest paging (round-2 VERDICT item 5): a commit that
    touches one bucket writes O(1 bucket page + root) metadata bytes, and
    that cost stays FLAT as untouched buckets accumulate files — the old
    single-JSON manifest rewrote every file's stats on every commit."""
    from pyspark.sql import functions as F

    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=64, merge_mode="mor"
    )
    mdir = os.path.join(str(tmp_path / "t"), "manifests")

    def meta_state():
        return {
            fn: os.path.getsize(os.path.join(mdir, fn))
            for fn in os.listdir(mdir)
        }

    def new_bytes(before):
        return sum(
            sz for fn, sz in meta_state().items() if fn not in before
        )

    def batch(keys, lsn):
        return spark.createDataFrame(
            [(f"doc-{k}", [k, k + 1], 2, "s", "U", lsn) for k in keys],
            "doc_id string, tokens array<int>, n_tok int, source string,"
            " op string, lsn long",
        ).withColumn("tokens", F.col("tokens").cast("array<int>"))

    # bootstrap: every bucket populated
    t.merge(batch(range(640), 1), batch_id=0)
    one_key_costs = []
    total_entries = []
    lsn = 2
    for round_no in range(3):
        before = meta_state()
        t.merge(batch([0], lsn), batch_id=lsn)  # single key -> one bucket
        one_key_costs.append(new_bytes(before))
        total_entries.append(len(t._manifest()["files"]))
        lsn += 1
        # inflate OTHER buckets' file counts (all-key MoR merge stacks one
        # delta file per bucket)
        t.merge(batch(range(640), lsn), batch_id=lsn)
        lsn += 1
    # table metadata grew every round...
    assert total_entries[-1] > total_entries[0]
    # ...but the single-bucket commit cost stayed flat (root + 1 page +
    # ledger jitter), nowhere near proportional to total entries
    assert one_key_costs[-1] < one_key_costs[0] * 1.5 + 512
    # and far below a full-metadata rewrite
    full_rewrite = sum(
        os.path.getsize(os.path.join(mdir, fn))
        for fn in os.listdir(mdir)
        if fn.startswith("bm-")
    )
    assert one_key_costs[-1] < full_rewrite / 4
