#!/usr/bin/env python
"""Benchmark harness (driver-run per round; BASELINE.md methodology).

Headline metric: CDC replay throughput (change-events/sec) into the lake
table, measured at local[8] and local[32] on the SAME synthesized event log
— the sandbox proxy for the north rule's N-vs-4N-executor scaling
requirement. Scaling efficiency = (T8 / T32) / 4.

Also times headline relational queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "cdc_replay_events_per_sec", "value": <events/sec at local[32]>,
   "unit": "events/sec", "queries": {<name>: seconds, ...}, "sf": <sf>,
   "scaling": {"local8_eps": ..., "local32_eps": ..., "efficiency": ...}}

Each parallelism level runs in a subprocess (one JVM cannot change master).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "64000000"))
N_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_BATCHES", "2"))
MAX_TOK = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_TOK", "64"))
HEADLINE_QUERIES = [
    "agg_pricing_summary",
    "join_sortmerge",
    "win_rank",
    "topk_per_group",
    "token_recount",
    "cdc_lww",
]


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def prepare_log(work: str) -> str:
    """Synthesize the event log once (at local[32]); both replay runs read it."""
    from rap_etl_spark.session import get_spark
    from rap_etl_spark.sources.synth import synthesize_events, write_event_log

    spark = get_spark(app_name="bench-prep", cpus=32)
    log_dir = os.path.join(work, "log")
    ev = synthesize_events(spark, SF_DIR, N_EVENTS, max_tok=MAX_TOK)
    write_event_log(ev, log_dir, n_batches=N_BATCHES, n_events=N_EVENTS)
    spark.stop()
    return log_dir


REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))


def replay_worker(cpus: int, log_dir: str, work: str) -> None:
    """Subprocess entry: replay the log at local[cpus] REPEATS times into
    fresh tables, print best seconds (min-of-k damps host noise — this VM
    shows 2-3x run-to-run variance under identical work)."""
    import shutil

    from rap_etl_spark.engine import replay_log
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.schemas import DOCS_SCHEMA
    from rap_etl_spark.session import get_spark

    spark = get_spark(app_name=f"bench-replay-{cpus}", cpus=cpus)
    # warm the JVM/session outside the timed region
    spark.read.parquet(os.path.join(log_dir, "batch=0")).count()
    times = []
    for rep in range(REPEATS):
        tdir = os.path.join(work, f"table-{cpus}-{rep}")
        shutil.rmtree(tdir, ignore_errors=True)
        table = ManifestParquetTable.create(spark, tdir, DOCS_SCHEMA, n_buckets=64)
        t0 = time.monotonic()
        replay_log(spark, table, log_dir, count_input=False)
        times.append(time.monotonic() - t0)
        shutil.rmtree(tdir, ignore_errors=True)
    print(json.dumps({"seconds": min(times), "all": times}))
    spark.stop()


def run_queries() -> dict[str, float]:
    import __spark_entry__ as entrymod
    from rap_etl_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", cpus=32)
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warm (plan + file listing)
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--replay-worker":
        replay_worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    # SPARK_GRAFT_BENCH_WORK: reuse a prepared work dir (log cached there) so
    # prepare and measure can run as separate invocations. Default to tmpfs:
    # the sandbox's single virtual disk reads ~185MB/s, which would make the
    # replay I/O-bound at every parallelism level; on a real cluster the
    # object store's aggregate bandwidth scales with executor count, and
    # tmpfs is the single-node stand-in for that property.
    default_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = os.environ.get("SPARK_GRAFT_BENCH_WORK") or tempfile.mkdtemp(
        prefix="rap-etl-bench-", dir=default_base
    )
    os.makedirs(work, exist_ok=True)
    log_dir = os.path.join(work, "log")
    if not os.path.exists(os.path.join(log_dir, "batch=0")):
        log_dir = prepare_log(work)
    if len(sys.argv) > 1 and sys.argv[1] == "--prepare-only":
        print(json.dumps({"prepared": log_dir}))
        return


    results: dict[int, float] = {}
    for cpus in (2, 8, 32):
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--replay-worker",
             str(cpus), log_dir, work],
            capture_output=True, text=True, env=env, check=False,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-4000:], file=sys.stderr)
            raise RuntimeError(f"replay worker local[{cpus}] failed")
        results[cpus] = json.loads(line[-1])["seconds"]

    eps = {c: N_EVENTS / results[c] for c in results}
    qtimes = run_queries()

    queries = {f"cdc_replay_local{c}_sec": round(results[c], 3) for c in results}
    queries.update(qtimes)
    print(
        json.dumps(
            {
                "metric": "cdc_replay_events_per_sec",
                "value": round(eps[32], 1),
                "unit": "events/sec",
                "queries": queries,
                "sf": _sf_label(SF_DIR),
                "scaling": {
                    "n_events": N_EVENTS,
                    "local2_eps": round(eps[2], 1),
                    "local8_eps": round(eps[8], 1),
                    "local32_eps": round(eps[32], 1),
                    # N -> 4N pairs: 2->8 is the compute-bound regime (the
                    # cluster analogue: per-node memory bandwidth scales with
                    # node count); 8->32 additionally shares one box's memory
                    # bus and shows the single-node bandwidth ceiling.
                    "efficiency_2_to_8": round((results[2] / results[8]) / 4.0, 3),
                    "efficiency_8_to_32": round((results[8] / results[32]) / 4.0, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
