"""Process-level multi-writer drill: TWO `cli replay` driver processes
commit disjoint batch ranges into the SAME table concurrently, racing on
the manifest-pointer CAS the whole way.

tests/test_occ_retry.py proves the rebase-and-retry loop inside one
session; this drill proves the full cross-process story — fcntl commit
lock + pointer CAS + rebase — in the deployment shape where it matters
(two spark-submit drivers tailing different source partitions into one
lake table). Each CAS loss costs a manifest re-read and retry, never a
data rewrite, so `--occ-retries 20` makes completion deterministic while
keeping the conflict path genuinely exercised (~8 interleaved commits
per writer)."""

import os
import subprocess
import sys

from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.synth import synthesize_events, write_event_log

from .oracle import assert_frames_equal, naive_final_state

N_EVENTS = 4000
N_BATCHES = 16


def test_two_writer_processes_interleave_cleanly(spark, sf_small, tmp_path):
    log = str(tmp_path / "log")
    tdir = str(tmp_path / "t")
    ev = synthesize_events(spark, sf_small, N_EVENTS, max_tok=8)
    write_event_log(ev, log, n_batches=N_BATCHES, n_events=N_EVENTS)
    ManifestParquetTable.create(spark, tdir, DOCS_SCHEMA, n_buckets=8)

    env = {
        **os.environ,
        "PYTHONPATH": "/root/repo",
        "SPARK_GRAFT_CPUS": "4",
    }

    def writer(batch_ids):
        return subprocess.Popen(
            [
                sys.executable, "-m", "rap_etl_spark.cli",
                "replay", "--table", tdir, "--log", log,
                "--batches", ",".join(str(b) for b in batch_ids),
                "--occ-retries", "20",
            ],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )

    a = writer(range(0, N_BATCHES, 2))
    b = writer(range(1, N_BATCHES, 2))
    rc_a, rc_b = a.wait(timeout=600), b.wait(timeout=600)
    assert rc_a == 0 and rc_b == 0, (rc_a, rc_b)

    t = ManifestParquetTable(spark, tdir)
    # every batch from both writers committed exactly once
    assert {int(k) for k in t.committed_batches()} == set(range(N_BATCHES))
    # interleaved-LSN convergence: the final state is order-independent,
    # so racing writers must land the same state a serial replay would
    want = naive_final_state(ev.toPandas())
    assert_frames_equal(t.read().toPandas(), want)
    assert t.fsck()["ok"]
