#!/usr/bin/env python
"""Benchmark harness (driver-run per round; BENCH/BASELINE.md methodology).

Headline metric: CDC replay throughput (change-events/sec) into the lake
table, measured at local[2] / local[8] / local[32] on the SAME synthesized
packed-WAL event log — the sandbox proxy for the north rule's
N-vs-4N-executor scaling requirement. Scaling efficiency for an (N, 4N)
pair = (T_N / T_4N) / 4.

Noise handling (this VM shows multi-minute 3-5x slowdown episodes):
- parallelism levels are INTERLEAVED round-robin (2,8,32, 2,8,32, ...) so a
  noise episode hits all levels, not one; per-level time = min over rounds;
- a pure-CPU busy-loop calibration measures the PLATFORM scaling ceiling of
  the moment (32 vCPUs on an oversubscribed hypervisor reach only ~0.6
  eff/core even for cache-resident arithmetic) and is reported alongside so
  engine efficiency can be read relative to what the host allows.

Prints ONE JSON line:
  {"metric": "cdc_replay_events_per_sec", "value": <events/sec at local[32]>,
   "unit": "events/sec", "queries": {...}, "sf": ..., "scaling": {...},
   "platform": {...}}

Each replay runs in its own subprocess (one JVM cannot change master).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "64000000"))
# One batch by default: the 10^10-event target implies >=10^8-row batches
# where per-batch fixed costs (job scheduling, commit, manifest) vanish;
# at 64M sandbox scale a 2-batch split doubles those fixed costs and
# understates scaling. Cross-batch merge semantics are covered by tests.
N_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_BATCHES", "1"))
MAX_TOK = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_TOK", "64"))
# Wire format of the synthesized WAL: packed (tokens as one LE-int32 blob
# per row, EVENTS_SCHEMA_PACKED — what a real binlog/Kafka tail carries) vs
# array (tokens as parquet array<int32>). Packed is the headline: parquet
# array-cell assembly dominated the scan (~10x the blob decode cost) and the
# engine only expands winners. Set =0 to bench the array WAL.
PACKED = os.environ.get("SPARK_GRAFT_BENCH_PACKED", "1") == "1"
LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_BENCH_LEVELS", "2,8,32").split(",")
)
ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
# Merge-heavy scenario: a second, smaller log over a ~10^6-key universe so
# the winner delta (and therefore the bucket-CoW merge) carries real data
# volume — the headline log's 5000-key universe makes the merge trivial.
# Batch 0 bootstraps ~1M rows; batch 1 upserts into them.
MERGE_KEYS = int(os.environ.get("SPARK_GRAFT_BENCH_MERGE_KEYS", "1000000"))
MERGE_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_MERGE_EVENTS", "16000000"))
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


def _burn(n: int) -> float:
    t0 = time.monotonic()
    x = 0
    for i in range(n):
        x += i * i
    return time.monotonic() - t0


def platform_calibration() -> dict:
    """Pure-CPU scaling ceiling of the host right now: busy-loop eff/core at
    each level. An engine 8->32 efficiency cannot exceed the 8->32 ratio of
    these numbers — 32 vCPUs on an oversubscribed VM are not 32 cores."""
    n = 20_000_000
    t1 = _burn(n)
    out = {"procs1_sec": round(t1, 3)}
    for k in LEVELS:
        t0 = time.monotonic()
        with mp.Pool(k) as p:
            p.map(_burn, [n] * k)
        dt = time.monotonic() - t0
        out[f"procs{k}_eff_per_core"] = round(t1 / dt, 3)
    return out


def _retry(fn, attempts: int = 3):
    """This VM intermittently kills a Python worker mid-synthesis (EOF on
    the Arrow stream, no fault trace, memory plentiful) — a transient
    infra failure, not a code path. Retry the whole prep a bounded number
    of times before giving up."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - deliberate broad retry
            last = e
            print(f"prep attempt {i + 1}/{attempts} failed: {e}", file=sys.stderr)
    raise last


def prepare_log(work: str) -> str:
    """Synthesize the event log once (at local[32]); all replay runs read it."""
    import shutil

    from rap_etl_spark.session import get_spark
    from rap_etl_spark.sources.synth import synthesize_events, write_event_log

    spark = get_spark(app_name="bench-prep", cpus=32)
    log_dir = os.path.join(work, "log-packed" if PACKED else "log-array")
    staging = os.path.join(work, "stage-raw")

    def _run():
        ev = synthesize_events(
            spark, SF_DIR, N_EVENTS, max_tok=MAX_TOK, packed=PACKED,
            staging_dir=staging,
        )
        write_event_log(ev, log_dir, n_batches=N_BATCHES, n_events=N_EVENTS)

    _retry(_run)
    shutil.rmtree(staging, ignore_errors=True)
    spark.stop()
    return log_dir


def prepare_merge_log(work: str) -> str:
    import shutil

    from rap_etl_spark.session import get_spark
    from rap_etl_spark.sources.synth import synthesize_events, write_event_log

    spark = get_spark(app_name="bench-prep-merge", cpus=32)
    log_dir = os.path.join(work, "log-merge")
    staging = os.path.join(work, "stage-raw-merge")
    def _run():
        ev = synthesize_events(
            spark, SF_DIR, MERGE_EVENTS, max_tok=MAX_TOK, packed=PACKED,
            staging_dir=staging, n_keys=MERGE_KEYS,
        )
        write_event_log(ev, log_dir, n_batches=2, n_events=MERGE_EVENTS)

    _retry(_run)
    shutil.rmtree(staging, ignore_errors=True)
    spark.stop()
    return log_dir


def replay_worker(cpus: int, log_dir: str, work: str, n_buckets: int = 16) -> None:
    """Subprocess entry: replay the log ONCE at local[cpus] into a fresh
    table, print seconds. (Min-over-rounds happens in the parent, with
    rounds interleaved across levels.) Bucket count is sized to the final
    table's data volume — the same sizing rule a real deployment uses
    (headline table ~5k rows -> 16; merge-heavy ~1M rows -> 64)."""
    import shutil

    from rap_etl_spark.engine import replay_log
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.schemas import DOCS_SCHEMA
    from rap_etl_spark.session import get_spark

    spark = get_spark(app_name=f"bench-replay-{cpus}", cpus=cpus)
    # warm the JVM/session outside the timed region
    spark.read.parquet(os.path.join(log_dir, "batch=0")).count()
    tdir = os.path.join(work, f"table-{cpus}")
    shutil.rmtree(tdir, ignore_errors=True)
    table = ManifestParquetTable.create(spark, tdir, DOCS_SCHEMA, n_buckets=n_buckets)
    t0 = time.monotonic()
    replay_log(spark, table, log_dir, count_input=False)
    dt = time.monotonic() - t0
    shutil.rmtree(tdir, ignore_errors=True)
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
        nb = int(sys.argv[5]) if len(sys.argv) > 5 else 16
        replay_worker(int(sys.argv[2]), sys.argv[3], sys.argv[4], n_buckets=nb)
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
    log_dir = os.path.join(work, "log-packed" if PACKED else "log-array")
    if not os.path.exists(os.path.join(log_dir, "batch=0")):
        log_dir = prepare_log(work)
    if len(sys.argv) > 1 and sys.argv[1] == "--prepare-only":
        print(json.dumps({"prepared": log_dir}))
        return

    times: dict[int, list[float]] = {c: [] for c in LEVELS}
    for _round in range(ROUNDS):
        for cpus in LEVELS:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--replay-worker",
                 str(cpus), log_dir, work],
                capture_output=True, text=True, env=dict(os.environ), check=False,
            )
            line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(proc.stdout[-2000:], file=sys.stderr)
                print(proc.stderr[-4000:], file=sys.stderr)
                raise RuntimeError(f"replay worker local[{cpus}] failed")
            times[cpus].append(json.loads(line[-1])["seconds"])

    best = {c: min(ts) for c, ts in times.items()}
    eps = {c: N_EVENTS / best[c] for c in LEVELS}

    # merge-heavy scenario: 2 rounds at the top level, min
    merge_log = os.path.join(work, "log-merge")
    if not os.path.exists(os.path.join(merge_log, "batch=0")):
        merge_log = prepare_merge_log(work)
    mtimes = []
    for _ in range(2):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--replay-worker",
             str(max(LEVELS)), merge_log, work, "64"],
            capture_output=True, text=True, env=dict(os.environ), check=False,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if line:
            mtimes.append(json.loads(line[-1])["seconds"])
        else:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-4000:], file=sys.stderr)
            print("merge-heavy replay worker failed (continuing)", file=sys.stderr)
    merge_heavy = {
        "n_events": MERGE_EVENTS,
        "n_keys": MERGE_KEYS,
        "best_sec": round(min(mtimes), 3) if mtimes else None,
        "eps": round(MERGE_EVENTS / min(mtimes), 1) if mtimes else None,
    }

    platform = platform_calibration()
    qtimes = run_queries()

    queries = {f"cdc_replay_local{c}_sec": round(best[c], 3) for c in LEVELS}
    queries.update(qtimes)
    scaling = {
        "n_events": N_EVENTS,
        "n_batches": N_BATCHES,
        "wire_format": "packed" if PACKED else "array",
        "all_times_sec": {str(c): [round(t, 2) for t in ts] for c, ts in times.items()},
    }
    for c in LEVELS:
        scaling[f"local{c}_eps"] = round(eps[c], 1)
    for lo, hi in zip(LEVELS, LEVELS[1:]):
        if hi == 4 * lo:
            eff = (best[lo] / best[hi]) / 4.0
            scaling[f"efficiency_{lo}_to_{hi}"] = round(eff, 3)
            plo = platform.get(f"procs{lo}_eff_per_core")
            phi = platform.get(f"procs{hi}_eff_per_core")
            if plo and phi:
                # engine efficiency relative to what the host's real core
                # budget allows for ANY 4x-threads scale-up right now
                scaling[f"efficiency_{lo}_to_{hi}_vs_platform"] = round(
                    eff / (phi / plo), 3
                )
    top = max(LEVELS)
    print(
        json.dumps(
            {
                "metric": "cdc_replay_events_per_sec",
                "value": round(eps[top], 1),
                "unit": "events/sec",
                "queries": queries,
                "sf": _sf_label(SF_DIR),
                "scaling": scaling,
                "merge_heavy": merge_heavy,
                "platform": platform,
            }
        )
    )


if __name__ == "__main__":
    main()
