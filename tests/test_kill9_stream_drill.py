"""OS-level crash drill for the STREAMING tail: SIGKILL a `cli stream`
driver mid-stream, restart it on the same checkpoint, and assert the
table reconverges to the exact oracle state with no double-apply.

Companion to tests/test_kill9_drill.py (batch replay): this one proves
the north rule's "resumable from checkpoint" sentence at the process
boundary — a dead Structured Streaming driver leaves an offsets WAL
entry for an epoch whose commit may or may not have landed; the restart
re-runs that epoch with the SAME epoch id, and the table's batch ledger
turns the rerun into a metadata-only skip instead of a double-apply.
In-process checkpoint-resume is covered by tests/test_streaming.py; only
a real kill exercises the path where the JVM had no chance to clean up.

`--max-files 1` forces many small micro-batches so the kill reliably
lands between epochs with durable work on both sides of it."""

import json
import os
import signal
import subprocess
import sys
import time

from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.synth import synthesize_events, write_event_log

from .oracle import assert_frames_equal, naive_final_state

N_EVENTS = 4000
N_BATCHES = 12


def _committed_count(table_dir: str) -> int:
    try:
        ptr = json.load(open(os.path.join(table_dir, "_current.json")))
        m = json.load(
            open(
                os.path.join(
                    table_dir, "manifests", f"manifest-{ptr['snapshot_id']}.json"
                )
            )
        )
        return len(m.get("committed", {}))
    except (OSError, ValueError, KeyError):
        return 0


def test_kill9_mid_stream_then_checkpoint_restart_converges(
    spark, sf_small, tmp_path
):
    log = str(tmp_path / "log")
    tdir = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    ev = synthesize_events(spark, sf_small, N_EVENTS, max_tok=8)
    write_event_log(ev, log, n_batches=N_BATCHES, n_events=N_EVENTS)
    ManifestParquetTable.create(spark, tdir, DOCS_SCHEMA, n_buckets=8)

    cmd = [
        sys.executable, "-m", "rap_etl_spark.cli",
        "stream", "--table", tdir, "--log", log,
        "--checkpoint", cp, "--max-files", "1",
    ]
    env = {
        **os.environ,
        "PYTHONPATH": "/root/repo",
        "SPARK_GRAFT_CPUS": "4",
    }
    victim = subprocess.Popen(
        cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    try:
        deadline = time.monotonic() + 180
        while _committed_count(tdir) < 2:
            if victim.poll() is not None or time.monotonic() > deadline:
                break
            time.sleep(0.2)
        victim.send_signal(signal.SIGKILL)
    finally:
        victim.wait()
    interrupted_at = _committed_count(tdir)
    assert interrupted_at > 0, "kill landed before any durable commit"

    # fresh driver, same checkpoint: availableNow drains the backlog
    resume = subprocess.run(
        cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    assert resume.returncode == 0

    t = ManifestParquetTable(spark, tdir)
    ledger = t.committed_batches()
    # exactly-once across the restart: every epoch committed exactly once
    # (the ledger is keyed by epoch id — a double-apply would have raised
    # in merge; a gap would leave missing rows and fail the oracle below)
    assert len(ledger) >= interrupted_at

    want = naive_final_state(ev.toPandas())
    assert_frames_equal(t.read().toPandas(), want)
    assert t.fsck()["ok"]

    # a third run over the drained log is a pure no-op
    n_before = len(t.committed_batches())
    again = subprocess.run(
        cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    assert again.returncode == 0
    t2 = ManifestParquetTable(spark, tdir)
    assert len(t2.committed_batches()) == n_before
