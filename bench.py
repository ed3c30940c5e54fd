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
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "32000000"))
N_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_BATCHES", "2"))
MAX_TOK = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_TOK", "48"))
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


def replay_worker(cpus: int, log_dir: str, work: str) -> None:
    """Subprocess entry: replay the log at local[cpus], print seconds."""
    from rap_etl_spark.engine import replay_log
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.schemas import DOCS_SCHEMA
    from rap_etl_spark.session import get_spark

    spark = get_spark(app_name=f"bench-replay-{cpus}", cpus=cpus)
    table = ManifestParquetTable.create(
        spark, os.path.join(work, f"table-{cpus}"), DOCS_SCHEMA, n_buckets=64
    )
    # warm the JVM/session outside the timed region
    spark.read.parquet(os.path.join(log_dir, "batch=0")).count()
    t0 = time.monotonic()
    replay_log(spark, table, log_dir, count_input=False)
    dt = time.monotonic() - t0
    print(json.dumps({"seconds": dt}))
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

    work = tempfile.mkdtemp(prefix="rap-etl-bench-")
    log_dir = prepare_log(work)

    results: dict[int, float] = {}
    for cpus in (8, 32):
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

    eps8 = N_EVENTS / results[8]
    eps32 = N_EVENTS / results[32]
    efficiency = (results[8] / results[32]) / 4.0

    qtimes = run_queries()

    queries = {f"cdc_replay_local{c}_sec": round(results[c], 3) for c in results}
    queries.update(qtimes)
    print(
        json.dumps(
            {
                "metric": "cdc_replay_events_per_sec",
                "value": round(eps32, 1),
                "unit": "events/sec",
                "queries": queries,
                "sf": _sf_label(SF_DIR),
                "scaling": {
                    "n_events": N_EVENTS,
                    "local8_eps": round(eps8, 1),
                    "local32_eps": round(eps32, 1),
                    "efficiency_8_to_32": round(efficiency, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
