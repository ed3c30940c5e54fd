"""OS-level crash drill: SIGKILL a `cli replay` DRIVER PROCESS mid-run,
then rerun the identical command and assert the table converges to the
exact oracle state with every batch committed exactly once.

tests/test_crash_recovery.py proves commit atomicity by fault-injecting
INSIDE one process; this drill proves the same contract at the process
boundary the north rule actually deploys (spark-submit driver dies —
OOM-killer, preemption, node loss — and a fresh driver resumes from
durable state alone). Nothing in-process survives the kill: the resume
sees only the manifest pointer, the batch ledger, and whatever data
files the dead driver managed to write — exactly the exactly-once
evidence class (idempotent commit manifests) BASELINE.json names.

The kill is timed by polling the table's durable commit state (pointer
file -> manifest JSON -> ledger size, plain filesystem reads — no Spark)
until >= 2 of the 16 batches landed, so it reliably hits the window
where some batches are committed and some are mid-flight."""

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
N_BATCHES = 16


def _committed_count(table_dir: str) -> int:
    """Durable ledger size, read the way a brand-new driver would: pointer
    file -> manifest JSON. Returns 0 while nothing is committed yet."""
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


def test_kill9_mid_replay_then_resume_converges(spark, sf_small, tmp_path):
    log = str(tmp_path / "log")
    tdir = str(tmp_path / "t")
    ev = synthesize_events(spark, sf_small, N_EVENTS, max_tok=8)
    write_event_log(ev, log, n_batches=N_BATCHES, n_events=N_EVENTS)
    ManifestParquetTable.create(spark, tdir, DOCS_SCHEMA, n_buckets=8)

    cmd = [
        sys.executable, "-m", "rap_etl_spark.cli",
        "replay", "--table", tdir, "--log", log,
    ]
    env = {
        **os.environ,
        "PYTHONPATH": "/root/repo",
        "SPARK_GRAFT_CPUS": "4",  # small subprocess JVMs
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
    # the drill only means something if the kill landed mid-run
    assert 0 < interrupted_at < N_BATCHES, interrupted_at

    # a FRESH driver resumes from durable state alone and finishes
    resume = subprocess.run(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True
    )
    assert resume.returncode == 0, resume.stdout[-2000:]
    summary = [
        json.loads(line) for line in resume.stdout.splitlines()
        if line.startswith("{")
    ]
    skipped = [s for s in summary if s.get("skipped")]
    # everything the dead driver durably committed was skipped, not redone
    assert len(skipped) == interrupted_at, (len(skipped), interrupted_at)

    # exactly-once ledger: every batch committed once, none missing
    t = ManifestParquetTable(spark, tdir)
    committed = {int(b) for b in t.committed_batches()}
    assert committed == set(range(N_BATCHES))

    # final state == the naive replay oracle, bit-for-bit
    want = naive_final_state(ev.toPandas())
    assert_frames_equal(t.read().toPandas(), want)

    # and the layout survived the kill with its invariants intact
    assert t.fsck()["ok"]
