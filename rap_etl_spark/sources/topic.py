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

    commits = routed.mapInArrow(_task, "p long, tmp string, rows long").collect()
    published: dict[int, int] = {}
    for p in sorted({int(r["p"]) for r in commits}):
        msgs = [
            SegmentCommit(i, r["tmp"], int(r["rows"]))
            for i, r in enumerate(sorted(commits, key=lambda r: r["tmp"]))
            if int(r["p"]) == p
        ]
        published[p] = _publish(os.path.join(path, f"p={p}"), msgs)
    return published


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
