"""Snapshot-consistent multi-table catalog: one atomic pointer for a SET
of lake tables.

`engine.fanout_apply` routes one WAL batch into many tables with
exactly-once PER TABLE (each table's batch ledger); its cross-table
atomicity is at the retry level — between two table commits a reader
joining both tables can observe table A post-batch and table B pre-batch.
This module closes that window the way an Iceberg REST catalog's
multi-table transaction does: readers resolve every table THROUGH a
catalog pin file, and a transaction publishes all tables' new snapshot
ids in ONE atomic swap of that file. The per-table commits still happen
first (and stay idempotent via each table's ledger), but they are
invisible to catalog readers until the single swap — so a crash anywhere
before the swap leaves the catalog view on the old, mutually-consistent
snapshot set, and a full retry (skip-committed merges + re-swap)
converges.

Commit protocol (mirrors `ManifestParquetTable._write_manifest`):
read-modify-write of `_catalog.json` under the fsio `commit_lock`, with a
seq compare-and-swap — a concurrent transaction raises
`CommitConflictError` for the caller to re-read and retry. Readers never
take the lock: the pointer swap is `write_text_atomic`, so they see the
old pin set or the new one, never a mix. On S3/GCS the same CAS is a
conditional PUT on the catalog object (fsio deployment matrix).

Retention contract: a catalog pin keeps naming a table snapshot after the
table has moved on, so `expire_snapshots` retention must cover the
catalog's publish cadence — the same keep-up rule as incremental
(`table_changes`) readers; a pin older than retention raises on read.

Scale: the catalog file holds (name → path, snapshot_id) per table —
O(tables), rewritten once per TRANSACTION (not per table), independent of
table size, file counts, or batch volume. All data-plane work stays in
the per-table merge path.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from rap_etl_spark.lake import CommitConflictError, ManifestParquetTable


class CatalogTxn:
    """Accumulates (table → snapshot) pins; published by `Catalog.commit`."""

    def __init__(self, catalog: "Catalog"):
        self.catalog = catalog
        self._stage: dict[str, str] = {}

    def stage(self, name: str, snapshot_id: str | None = None) -> None:
        """Pin `name` at `snapshot_id` (default: the table's CURRENT
        snapshot — call after the table-level commit)."""
        if snapshot_id is None:
            snapshot_id = self.catalog.table(name).snapshot_id()
        self._stage[name] = snapshot_id


class Catalog:
    POINTER = "_catalog.json"

    def __init__(self, spark: SparkSession, root: str, fs=None):
        from rap_etl_spark.fsio import POSIX_FS

        self.spark = spark
        self.root = root
        self.fs = fs or POSIX_FS

    # ---------- pointer plumbing ----------
    def _pp(self) -> str:
        return os.path.join(self.root, self.POINTER)

    def _state(self) -> dict:
        return json.loads(self.fs.read_text(self._pp()))

    def _swap(self, state: dict, expected_seq: int) -> None:
        lock = os.path.join(self.root, "_catalog.lock")
        with self.fs.commit_lock(lock):
            cur = self._state()
            if cur["seq"] != expected_seq:
                raise CommitConflictError(
                    f"catalog base seq {expected_seq} is stale; "
                    f"current is {cur['seq']}"
                )
            state["seq"] = expected_seq + 1
            state["committed_at"] = time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            )
            self.fs.write_text_atomic(self._pp(), json.dumps(state))

    # ---------- lifecycle ----------
    @classmethod
    def create(cls, spark: SparkSession, root: str, fs=None) -> "Catalog":
        c = cls(spark, root, fs=fs)
        if c.fs.exists(c._pp()):
            raise FileExistsError(f"catalog already exists at {root}")
        c.fs.makedirs(root)
        c.fs.write_text_atomic(
            c._pp(), json.dumps({"seq": 0, "tables": {}})
        )
        return c

    def register(self, name: str, table: ManifestParquetTable) -> None:
        """Add a table, pinned at its current snapshot (one catalog commit)."""
        st = self._state()
        if name in st["tables"]:
            raise ValueError(f"table {name!r} already registered")
        st["tables"][name] = {
            "path": table.path,
            "key": table.key,
            "snapshot_id": table.snapshot_id(),
        }
        self._swap(st, st["seq"])

    def names(self) -> list[str]:
        return sorted(self._state()["tables"])

    def pins(self) -> dict[str, str]:
        return {
            n: e["snapshot_id"]
            for n, e in self._state()["tables"].items()
        }

    def table(self, name: str) -> ManifestParquetTable:
        """Open the LIVE table (current snapshot — the writer's view)."""
        e = self._state()["tables"][name]
        return ManifestParquetTable(
            self.spark, e["path"], key=e["key"], fs=self.fs
        )

    def read(self, name: str) -> DataFrame:
        """Catalog-consistent read: the table AT ITS PINNED snapshot. Every
        `read()` between two transactions resolves the same snapshot set,
        so cross-table joins are consistent regardless of in-flight
        table-level commits."""
        e = self._state()["tables"][name]
        return self.table(name).read(snapshot_id=e["snapshot_id"])

    # ---------- transactions ----------
    def txn(self) -> CatalogTxn:
        return CatalogTxn(self)

    def commit(self, txn: CatalogTxn) -> int:
        """Publish every staged pin in ONE atomic pointer swap; returns the
        new catalog seq. CommitConflictError if another transaction landed
        since this one's base state was read — re-stage and retry (staging
        re-reads current table snapshots, so a retry converges)."""
        st = self._state()
        base = st["seq"]
        unknown = set(txn._stage) - set(st["tables"])
        if unknown:
            raise ValueError(f"unregistered tables in txn: {sorted(unknown)}")
        for name, sid in txn._stage.items():
            st["tables"][name]["snapshot_id"] = sid
        self._swap(st, base)
        return base + 1


def fanout_apply_txn(
    spark: SparkSession,
    catalog: Catalog,
    events: DataFrame,
    batch_id: int,
    table_col: str = "_table",
    **engine_kwargs,
):
    """`engine.fanout_apply` with catalog-level atomicity: route the batch
    into every catalog table (exactly-once per table via each ledger),
    then publish ALL new snapshots in one catalog swap. A crash between
    any two steps leaves catalog readers on the old consistent view; a
    full redelivery of the same `batch_id` skips the committed merges and
    completes the swap — convergent end to end."""
    from rap_etl_spark.engine import fanout_apply

    tables = {n: catalog.table(n) for n in catalog.names()}
    metrics = fanout_apply(
        spark, events, tables, batch_id, table_col=table_col, **engine_kwargs
    )
    txn = catalog.txn()
    for name, t in tables.items():
        txn.stage(name, t.snapshot_id())
    catalog.commit(txn)
    return metrics
