"""Partitioned WAL topic over the `.rapwal` wire format — the Kafka shape
of the binlog source (SURVEY.md X21 generalized to N ordered partitions).

Layout::

    <topic>/p=0/segment-000000.rapwal
    <topic>/p=0/segment-000001.rapwal
    <topic>/p=1/segment-000000.rapwal
    ...

Each partition dir is an independent ordered segment log with the binlog
source's publishing contract (executors write attempt-unique temps, the
driver publishes by ordered atomic rename with contiguous numbering), so
within a partition the "offset = consumed segment count" premise holds
exactly as for the flat binlog dir. Across partitions there is NO total
order — the Kafka model — which is all the CDC engine needs: the LWW merge
orders by (doc_id, lsn), and a key routes to one partition, so per-key
order is preserved end-to-end.

Streaming offset = a VECTOR ``{"p": {"0": n0, "1": n1, ...}}`` checkpointed
through the Structured Streaming offset log: exactly-once across the whole
vector composes with the table ledger exactly as for the flat source.
``maxSegmentsPerTrigger`` is a TOTAL cap per micro-batch, rationed
round-robin across partitions so one hot partition cannot starve the rest
(Kafka's maxOffsetsPerTrigger semantics). Partition dirs appearing
mid-stream are discovered at the next trigger and read from 0 — consumer
rebalancing's moral equivalent for a growing topic.

Scale: the driver only lists directories and renames files — O(partitions
+ new segments) per trigger, no data. Each segment decodes executor-side
as zero-copy Arrow batches (one Spark input partition per segment).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from rap_etl_spark.sources.binlog import (
    BINLOG_SCHEMA,
    MAGIC,
    SegmentCommit,
    _list_segments,
    _publish,
    _read_segment,
    _write_task_tmp,
    encode_block,  # noqa: F401  (re-export for tests/tools)
)

_WIRE_COLS = ["op", "doc_id", "lsn", "tokens", "source"]


def _part_dirs(path: str) -> list[tuple[int, str]]:
    """Sorted (partition id, dir) pairs. Listing only — no data I/O."""
    out = []
    if os.path.isdir(path):
        for d in os.listdir(path):
            if d.startswith("p="):
                try:
                    out.append((int(d.split("=", 1)[1]), os.path.join(path, d)))
                except ValueError:
                    continue
    return sorted(out)


def write_topic(
    events: DataFrame,
    path: str,
    n_partitions: int,
    route_col: str = "doc_id",
) -> dict[int, int]:
    """Produce one segment per non-empty topic partition in ONE Spark job:
    rows route by ``pmod(xxhash64(route_col), n_partitions)`` (stable — a
    key always lands in the same partition, preserving its per-key order),
    ``repartition(n, _p)`` clusters each topic partition into one task,
    executors write attempt-unique temps, and the driver publishes each
    partition dir by ordered atomic rename. Returns {partition: segments
    published}. Repeated calls append segments — the producer loop."""
    commits = _stage_segments(events, path, n_partitions, route_col)
    published: dict[int, int] = {}
    for p in sorted({int(r["p"]) for r in commits}):
        msgs = [
            SegmentCommit(i, r["tmp"], int(r["rows"]))
            for i, r in enumerate(sorted(commits, key=lambda r: r["tmp"]))
            if int(r["p"]) == p
        ]
        published[p] = _publish(os.path.join(path, f"p={p}"), msgs)
    return published


def _stage_segments(
    events: DataFrame,
    path: str,
    n_partitions: int,
    route_col: str = "doc_id",
) -> list:
    """Shared producer core: route rows to topic partitions and write one
    attempt-unique temp file per (task, partition) executor-side. Returns
    the collected (p, tmp, rows) commit rows; the CALLER decides how the
    temps become visible (append-publish for the producer, atomic
    replacement for the compactor)."""
    missing = [c for c in _WIRE_COLS if c not in events.columns]
    if missing:
        raise ValueError(f"topic writer needs wire columns {missing}")
    routed = events.select(
        *_WIRE_COLS,
        F.pmod(F.xxhash64(F.col(route_col)), F.lit(n_partitions))
        .cast("int")
        .alias("_p"),
    ).repartition(n_partitions, F.col("_p"))

    def _task(it):
        import pandas as pd
        import pyarrow as pa

        from pyspark import TaskContext

        tc = TaskContext.get()
        att = tc.attemptNumber()
        # a task may (rarely, post-AQE-coalesce) hold several _p groups:
        # write one temp per group, never mixing partitions in a segment
        bufs: dict[int, list] = {}
        for batch in it:
            pdf = batch.to_pandas()
            if not len(pdf):
                continue
            for p, grp in pdf.groupby("_p"):
                bufs.setdefault(int(p), []).append(grp.drop(columns=["_p"]))
        rows = []
        for p, frames in bufs.items():
            pdir = os.path.join(path, f"p={p}")
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(
                pdir, f".part-{tc.partitionId():06d}-a{att}.tmp"
            )
            n = 0
            with open(tmp, "wb") as f:
                f.write(MAGIC)
                for pdf in frames:
                    f.write(encode_block(pdf))
                    n += len(pdf)
            rows.append((p, tmp, n))
        yield pa.RecordBatch.from_pandas(
            pd.DataFrame(rows, columns=["p", "tmp", "rows"]),
            preserve_index=False,
        ) if rows else pa.RecordBatch.from_pandas(
            pd.DataFrame({"p": pd.Series([], dtype="int64"),
                          "tmp": pd.Series([], dtype="object"),
                          "rows": pd.Series([], dtype="int64")}),
            preserve_index=False,
        )

    return routed.mapInArrow(_task, "p long, tmp string, rows long").collect()


def compact_topic(
    spark,
    path: str,
    drop_tombstones: bool = False,
) -> dict[int, dict]:
    """Kafka-style log compaction (X91): rewrite each partition's current
    segment prefix so only the LATEST record per key survives (plus 'D'
    tombstones, unless ``drop_tombstones``) — the retention mode a CDC
    changelog topic runs under, where the topic's value is "latest state
    per key", not full history.

    Offset preservation: the stream offset is "segments consumed", so the
    segment COUNT must not change. The compacted winner set lands in the
    snapshot's LAST segment (atomic per-file replace) and every earlier
    segment becomes a valid EMPTY segment (bare magic). A consumer whose
    checkpoint sits anywhere inside the compacted range therefore resumes
    at a real offset; it re-receives at most the winner set, which the
    LWW/ledger downstream collapses — the same at-least-once → exactly-once
    argument as segment redelivery.

    Crash safety is by SEMANTICS, not by multi-file atomicity: the winner
    blob is installed FIRST, and only then are older segments emptied, so
    at every intermediate state the partition's union of segments is a
    per-key superset of the latest state (compaction only ever removes
    superseded records). A crash mid-compaction leaves a bigger topic,
    never a wrong one.

    Concurrency: producers appending NEW segments (>= the snapshot count)
    are untouched; run at most one compactor per topic. Assumes the
    partition count has never changed (fixed at creation — the Kafka
    model), so key→partition routing is stable and global LWW equals
    per-partition LWW.

    Scale: one Spark job (segment-parallel decode → winner reduce → one
    writer task per partition); the driver only lists, renames and writes
    O(segments) empty headers — no data moves through it."""
    from rap_etl_spark.operators.cdc import lww_latest

    parts = _part_dirs(path)
    if not parts:
        return {}
    snapshot: dict[int, list[str]] = {
        p: _list_segments(pdir) for p, pdir in parts
    }
    snapshot = {p: segs for p, segs in snapshot.items() if segs}
    if not snapshot:
        return {}
    n_partitions = len(parts)
    register(spark)  # idempotent: latest registration wins
    df = (
        spark.read.format("rap-etl-topic").option("path", path).load()
    )
    winners = lww_latest(df, key="doc_id")
    if drop_tombstones:
        winners = winners.filter(F.col("op") != "D")
    commits = _stage_segments(winners, path, n_partitions)
    by_p = {int(r["p"]): r for r in commits}
    stats: dict[int, dict] = {}
    for p, segs in snapshot.items():
        before = sum(os.path.getsize(s) for s in segs)
        staged = by_p.pop(p, None)
        # install the winner blob in the LAST snapshot segment first...
        if staged is not None:
            os.replace(staged["tmp"], segs[-1])
        else:
            # no winners routed here (all keys tombstoned + dropped):
            # the last segment becomes empty too
            _write_empty_segment(segs[-1])
        # ...then empty the superseded prefix (crash-safe order)
        for s in segs[:-1]:
            _write_empty_segment(s)
        stats[p] = {
            "segments": len(segs),
            "rows_after": int(staged["rows"]) if staged is not None else 0,
            "bytes_before": before,
            "bytes_after": sum(os.path.getsize(s) for s in segs),
        }
    # a staged temp for a partition with no snapshot segments can only
    # mean rows routed to a partition dir the snapshot missed — impossible
    # under a fixed partition count, so treat leftovers as a bug signal
    for r in by_p.values():
        os.unlink(r["tmp"])
    if by_p:
        raise RuntimeError(
            f"compaction routed rows to unknown partitions {sorted(by_p)}"
        )
    return stats


def _write_empty_segment(dest: str) -> None:
    """Atomically replace ``dest`` with a valid zero-record segment."""
    tmp = dest + ".compact-tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
    os.replace(tmp, dest)


class TopicSegment(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TopicBatchReader(DataSourceReader):
    """Batch read = every segment of every partition, one Spark input
    partition per segment."""

    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        return [
            TopicSegment(s)
            for _, d in _part_dirs(self.path)
            for s in _list_segments(d)
        ]

    def read(self, partition):
        yield from _read_segment(partition.path)


class TopicStreamReader(DataSourceStreamReader):
    """Vector offset ``{"p": {pid: consumed-segment-count}}``. Sound per
    partition for the same reason as the flat binlog source (ordered
    atomic publish with contiguous numbering); the vector as a whole
    commits atomically through the SS offset log. Unknown partition ids in
    ``start`` (dirs created after the checkpoint) default to 0."""

    def __init__(self, options):
        self.path = options["path"]
        self.max_per_trigger = (
            int(options.get("maxsegmentspertrigger", 0)) or None
        )
        self._last_end: dict[str, int] | None = None

    def initialOffset(self):
        return {"p": {}}

    def latestOffset(self):
        avail = {
            str(pid): len(_list_segments(d)) for pid, d in _part_dirs(self.path)
        }
        base = self._last_end
        if self.max_per_trigger is None or base is None:
            self._last_end = avail
            return {"p": avail}
        # total cap, rationed one segment per partition round-robin in
        # ascending pid order — deterministic and starvation-free
        end = {pid: base.get(pid, 0) for pid in avail}
        budget = self.max_per_trigger
        progress = True
        while budget > 0 and progress:
            progress = False
            for pid in sorted(avail, key=int):
                if budget <= 0:
                    break
                if end[pid] < avail[pid]:
                    end[pid] += 1
                    budget -= 1
                    progress = True
        self._last_end = end
        return {"p": end}

    def partitions(self, start, end):
        self._last_end = dict(end["p"])
        s = start.get("p", {})
        out = []
        for pid, d in _part_dirs(self.path):
            lo = int(s.get(str(pid), 0))
            hi = int(end["p"].get(str(pid), 0))
            if hi > lo:
                out.extend(TopicSegment(p) for p in _list_segments(d)[lo:hi])
        return out

    def read(self, partition):
        yield from _read_segment(partition.path)

    def commit(self, end):
        self._last_end = dict(end["p"])


class TopicDataSource(DataSource):
    """spark.read / spark.readStream .format("rap-etl-topic")
    .option("path", topic_dir) — the partitioned consumer. Producing goes
    through ``write_topic`` (one job, per-partition ordered publish)."""

    @classmethod
    def name(cls):
        return "rap-etl-topic"

    def schema(self):
        return BINLOG_SCHEMA

    def reader(self, schema):
        return TopicBatchReader(self.options)

    def streamReader(self, schema):
        return TopicStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TopicDataSource)
