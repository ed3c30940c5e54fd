"""engine.chunked_bootstrap — DBLog-style pause-free chunked snapshot.

The algorithm's whole correctness claim is ONE invariant: final payload
state per key equals the plain global LWW of the log, regardless of how
many chunks, where the interleave lands, or how far ahead of the applied
watermark the source's own state runs. These tests pin that invariant at
its edges — delete inside the watermark window, chunk row staler than an
applied event, resurrect after the chunk missed a key — plus crash-resume
idempotency through the ledger."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rap_etl_spark.engine import chunked_bootstrap
from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.operators.cdc import lww_latest

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("val", T.LongType()),
    ]
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, int(l), None if v is None else int(v), op) for k, l, v, op in rows],
        T.StructType(
            SCHEMA.fields[:3] + [T.StructField("op", T.StringType())]
        ),
    )


def _state(table):
    return {
        (r.doc_id, r.val)
        for r in table.read().select("doc_id", "val").collect()
    }


def _lww_state(ev):
    win = lww_latest(ev)
    return {
        (r.doc_id, r.val)
        for r in win.filter(F.col("op") != "D").select("doc_id", "val").collect()
    }


def _run(spark, tmp_path, ev, n_chunks, cuts, gap, name):
    """Split ev into log batches at the given lsn cuts; source state for a
    chunk select is everything <= lo + gap (the source runs ahead)."""
    max_lsn = ev.agg(F.max("lsn")).first()[0]

    def select_chunk(cid, lo):
        s = min(lo + gap, max_lsn)
        view = lww_latest(ev.filter(F.col("lsn") <= s))
        return (
            view.filter(F.col("op") != "D")
            .filter(F.pmod(F.xxhash64("doc_id"), F.lit(n_chunks)) == cid)
            .select("doc_id", "val")
        )

    bounds = [0] + list(cuts) + [max_lsn]
    batches = [
        (
            lww_latest(
                ev.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi))
            ),
            hi,
        )
        for lo, hi in zip(bounds, bounds[1:])
        if hi > lo
    ]
    table = ManifestParquetTable.create(
        spark, str(tmp_path / name), SCHEMA, n_buckets=4
    )
    steps = chunked_bootstrap(spark, table, select_chunk, n_chunks, batches)
    return table, steps


@pytest.mark.parametrize(
    "n_chunks,cuts,gap",
    [
        (1, (50,), 0),  # one chunk, source exactly at the watermark
        (3, (30, 60), 17),  # alternating, source ahead
        (8, (), 100),  # no log left: pure chunked snapshot of final state
        (4, (20, 40, 60, 80), 5),  # more batches than chunks
    ],
)
def test_converges_to_global_lww(spark, tmp_path, n_chunks, cuts, gap):
    rows = []
    for i in range(200):
        k = f"k{i % 37}"
        op = "D" if i % 11 == 3 else "U"
        rows.append((k, i + 1, None if op == "D" else i * 7, op))
    ev = _events(spark, rows)
    table, steps = _run(
        spark, tmp_path, ev, n_chunks, cuts, gap, f"t{n_chunks}_{gap}"
    )
    assert _state(table) == _lww_state(ev)
    assert sum(1 for s in steps if s["step"] == "chunk") == n_chunks


def test_delete_inside_watermark_window(spark, tmp_path):
    """Key deleted AFTER the chunk's low watermark but BEFORE its select:
    the chunk omits it; the tail's tombstone (lsn > lo) must keep it dead.
    And key deleted before lo with no later event: must stay dead even
    though batch 1 applied the live row first."""
    ev = _events(
        spark,
        [
            ("a", 1, 10, "U"),
            ("a", 2, None, "D"),  # dead before lo=3
            ("b", 3, 30, "U"),
            ("b", 5, None, "D"),  # dies inside (lo=3, s=6]
            ("c", 4, 40, "U"),
        ],
    )
    table, _ = _run(spark, tmp_path, ev, 2, (3,), 3, "tdel")
    assert _state(table) == {("c", 40)}


def test_resurrect_after_chunk_missed_key(spark, tmp_path):
    """Chunk select at s=2 never sees key r (first event lsn 9): the later
    log batch must insert it; and a stale chunk row (key updated after s)
    must lose to the newer event when the tail replays it."""
    ev = _events(
        spark,
        [
            ("r", 9, 99, "U"),
            ("s", 1, 11, "U"),
            ("s", 8, 88, "U"),  # newer than any chunk view at s<=2
        ],
    )
    table, _ = _run(spark, tmp_path, ev, 1, (2,), 0, "tres")
    assert _state(table) == {("r", 99), ("s", 88)}


def test_crash_resume_is_idempotent(spark, tmp_path):
    """Every step commits under its own ledger batch id, so re-running the
    whole bootstrap (the crash-at-any-point recovery story) replays as
    no-ops and leaves the state byte-identical."""
    rows = [(f"k{i % 13}", i + 1, i, "U") for i in range(60)]
    ev = _events(spark, rows)
    max_lsn = 60

    def select_chunk(cid, lo):
        s = min(lo + 10, max_lsn)
        view = lww_latest(ev.filter(F.col("lsn") <= s))
        return (
            view.filter(F.col("op") != "D")
            .filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == cid)
            .select("doc_id", "val")
        )

    def batches():
        return [
            (lww_latest(ev.filter((F.col("lsn") > lo) & (F.col("lsn") <= lo + 20))), lo + 20)
            for lo in (0, 20, 40)
        ]

    table = ManifestParquetTable.create(
        spark, str(tmp_path / "tresume"), SCHEMA, n_buckets=4
    )
    chunked_bootstrap(spark, table, select_chunk, 3, batches())
    before = _state(table)
    snap_before = table.snapshot_id()
    chunked_bootstrap(spark, table, select_chunk, 3, batches())
    assert _state(table) == before == _lww_state(ev)
    assert table.snapshot_id() == snap_before
