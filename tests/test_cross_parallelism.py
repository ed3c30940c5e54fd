"""Cross-parallelism determinism: the north rule's replay-equivalence
claim says a WAL replay "reconverges to the identical table state" — and
on a real deployment the replay runs at whatever cluster size is on hand,
so the final state must not depend on the parallelism it ran at.

The in-process suite already proves convergence across BATCH SPLITS
(tests/test_replay.py). This test closes the remaining axis: the same
event log replayed in two SEPARATE processes at different parallelism
levels (local[2] vs local[8] — different shuffle partition counts, task
schedules, and commit interleavings) must produce byte-identical final
table rows. Comparison is a canonical sorted-row sha256 computed inside
each subprocess, so nothing about the parent session leaks in.
"""

import json
import os
import subprocess
import sys

from rap_etl_spark.sources.synth import synthesize_events, write_event_log

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Replays the shared log at the parallelism given by SPARK_GRAFT_CPUS and
# prints the canonical state hash. Runs cli.main twice (init + replay) in
# ONE process so each parallelism level costs a single JVM startup.
WORKER = """\
import hashlib, json, sys
from rap_etl_spark.cli import main

table, log = sys.argv[1], sys.argv[2]
assert main(["init", "--table", table, "--buckets", "8"]) == 0
assert main(["replay", "--table", table, "--log", log]) == 0

from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.session import get_spark

t = ManifestParquetTable(get_spark(), table)
rows = sorted(
    (r.doc_id, tuple(r.tokens), r.n_tok, r.source)
    for r in t.read().collect()
)
h = hashlib.sha256(json.dumps(rows).encode()).hexdigest()
print(json.dumps({"rows": len(rows), "hash": h}))
"""


def test_same_final_state_at_two_parallelism_levels(spark, tmp_path):
    log = str(tmp_path / "log")
    ev = synthesize_events(spark, "/root/testdata/sf0.001", 12000, max_tok=16)
    write_event_log(ev, log, n_batches=3, n_events=12000)

    results = {}
    for cpus in (2, 8):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            PYTHONPATH=REPO,
            SPARK_GRAFT_DRIVER_MEM="4g",
        )
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(tmp_path / f"t{cpus}"), log],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
            cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

    assert results[2]["rows"] == results[8]["rows"] > 0
    assert results[2]["hash"] == results[8]["hash"], (
        "replay is parallelism-dependent: "
        f"local[2] -> {results[2]}, local[8] -> {results[8]}"
    )
