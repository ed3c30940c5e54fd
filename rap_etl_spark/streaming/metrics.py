"""C10: streaming throughput metrics via StreamingQueryListener.

Captures per-micro-batch progress (rows, rates, durations) into an
in-memory ring the engine/bench can read, and optionally appends JSONL to
disk for post-hoc analysis — the generalization of the reference's per-run
log lines (SURVEY.md C9/C10).
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Collects onQueryProgress events: batch id, numInputRows,
    processedRowsPerSecond, batch duration."""

    def __init__(self, jsonl_path: str | None = None, keep: int = 1000):
        self.jsonl_path = jsonl_path
        self.keep = keep
        self.progress: list[dict] = []
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs or {}),
            "timestamp": p.timestamp,
        }
        with self._lock:
            self.progress.append(rec)
            if len(self.progress) > self.keep:
                self.progress = self.progress[-self.keep :]
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def totals(self) -> dict:
        with self._lock:
            rows = sum(r["num_input_rows"] for r in self.progress)
            batches = len(self.progress)
        return {"batches": batches, "rows": rows}


def attach(spark: SparkSession, jsonl_path: str | None = None) -> ThroughputListener:
    listener = ThroughputListener(jsonl_path)
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: ThroughputListener) -> None:
    spark.streams.removeListener(listener)
