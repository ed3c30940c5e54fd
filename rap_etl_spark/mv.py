"""Materialized views with automatic incremental refresh (X92).

The missing orchestration layer over the IVM primitives
(operators/incremental.py): a PERSISTED view defined by a declarative
spec over one lake table, refreshed incrementally from the table's
changefeed (`lake.table_changes`) instead of recomputed — the
Databricks-DLT / Materialize product shape, rebuilt on the manifest
layer.

Commit model (mirrors the lake table's): the view's state lives in
uniquely-named versioned parquet dirs `data/v{N}-{token}` (each refresh
attempt writes its OWN dir — a CAS loser can never have scribbled over
the winner's live data); `_mv.json` is the single commit point, swapped
atomically (write-temp + rename) and VERSION-CONDITIONAL under the
backend's commit lock (re-read before swap; a concurrent refresh loses
with a clean error, never a torn state). A crash after the data write
but before the swap leaves an orphan dir that a later `_gc` reaps —
refresh is idempotent because the cursor (the base snapshot the view
reflects) only advances in the same atomic swap.

Scale design — why this is a view REFRESH and not a view REBUILD:

- The delta source is `table_changes(cursor, head)`, which is
  bucket-pruned by manifest file-list comparison: a refresh after a
  batch that touched k of B buckets reads O(k/B · table), independent of
  history length — the fact table is never re-scanned whole.
- The 'agg' kind folds the delta with `apply_agg_delta` (one shuffle
  sized to the CHANGE SET, full-outer join against the current state on
  the group key). The 'minmax' kind is the non-distributive class:
  closed-form for inserts, and only groups whose deleted values touch a
  stored extremum trigger the broadcast-semi dirty re-aggregation
  (operators/incremental.maintain_minmax — plan pinned there). The
  'distinct_sketch' kind (X102) keeps a per-group HLL sketch: inserts
  fold in with a scalar hll_union (mergeable, fact never touched);
  groups seeing a delete/update-preimage re-aggregate via the same
  broadcast-semi dirty pattern — per-group DISTINCT at bounded state
  (2^lgk bytes/group) however wide the value domain grows.
- Retention interplay: if the cursor snapshot has been expired
  (`expire_snapshots` / vacuum), the changefeed is gone — exactly the
  Delta CDF / Iceberg incremental-read retention contract. The refresh
  then falls back to a FULL recompute at the current snapshot and says
  so in the result (``full_recompute=True``), rather than failing the
  view forever.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rap_etl_spark.lake import ManifestParquetTable

MV_FILE = "_mv.json"
#: versions of view state kept on disk after a refresh: the previous
#: version stays readable for any in-flight reader that resolved the
#: pointer just before the swap (same grace rationale as table vacuum).
KEEP_VERSIONS = 2

KINDS = ("agg", "minmax", "join", "token_stats", "distinct_sketch")


@dataclass
class RefreshInfo:
    skipped: bool
    from_snapshot: str | None
    to_snapshot: str
    version: int
    rows: int
    full_recompute: bool = False


def _validate_spec(spec: dict) -> None:
    kind = spec.get("kind")
    if kind not in KINDS:
        raise ValueError(f"mv kind must be one of {KINDS}, got {kind!r}")
    if kind in ("agg", "minmax", "distinct_sketch") and not spec.get(
        "group_cols"
    ):
        raise ValueError(f"{kind} mv spec needs non-empty group_cols")
    if kind == "agg" and "sum_cols" not in spec:
        raise ValueError("agg mv spec needs sum_cols (may be [])")
    if kind in ("minmax", "distinct_sketch") and not spec.get("val_col"):
        raise ValueError(f"{kind} mv spec needs val_col")
    if kind == "token_stats" and not spec.get("tokens_col"):
        raise ValueError("token_stats mv spec needs tokens_col")
    if kind == "join":
        for need in ("dim_path", "fact_col", "dim_col", "select"):
            if not spec.get(need):
                raise ValueError(f"join mv spec needs {need}")
        if spec["fact_col"] == spec["dim_col"]:
            raise ValueError(
                "join mv needs distinct fact_col/dim_col names (the "
                "maintenance join resolves the condition by column name)"
            )


class MaterializedView:
    """A persisted incrementally-maintained aggregate over one lake table."""

    def __init__(self, spark: SparkSession, path: str, base: ManifestParquetTable):
        self.spark = spark
        self.path = path
        self.base = base
        self.fs = base.fs

    # ---------- creation / loading ----------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        base: ManifestParquetTable,
        spec: dict,
        overwrite: bool = False,
    ) -> "MaterializedView":
        """CREATE MATERIALIZED VIEW: run the definition query once over the
        base table's CURRENT snapshot, persist it as v1, and pin the cursor
        to that snapshot — every later `refresh()` is incremental from
        there."""
        _validate_spec(spec)
        if spec["kind"] == "join" and base.key not in spec["select"]:
            raise ValueError(
                f"join mv select list must include the table key "
                f"{base.key!r} (the maintenance anti-join needs it)"
            )
        mv = cls(spark, path, base)
        if mv.fs.exists(os.path.join(path, MV_FILE)) and not overwrite:
            raise FileExistsError(f"materialized view already exists at {path}")
        snap = base.snapshot_id()
        state = mv._definition(base.read(), spec)
        dirname = mv._new_dirname(1)
        rows = mv._write_version(state, dirname)
        mv._commit(
            {
                "spec": spec,
                "base": base.path,
                "key": base.key,
                "cursor": snap,
                "version": 1,
                "rows": rows,
                "data_dir": dirname,
            },
            expect_version=None,
        )
        return mv

    @classmethod
    def load(
        cls, spark: SparkSession, path: str, base: ManifestParquetTable | None = None
    ) -> "MaterializedView":
        """Open an existing view; the base table path is recorded in the
        commit file, so callers only need it when the table moved."""
        probe = cls(spark, path, base or ManifestParquetTable(spark, path))
        meta = probe._meta()
        if base is None:
            base = ManifestParquetTable(spark, meta["base"], key=meta["key"])
        return cls(spark, path, base)

    # ---------- reads ----------

    def read(self) -> DataFrame:
        meta = self._meta()
        return self.spark.read.parquet(self._vdir_of(meta))

    def spec(self) -> dict:
        return dict(self._meta()["spec"])

    def cursor(self) -> str:
        return self._meta()["cursor"]

    # ---------- refresh ----------

    def refresh(self) -> RefreshInfo:
        """Advance the view to the base table's current snapshot.

        No base change -> no-op (skipped). Cursor within retention ->
        incremental maintenance from the changefeed. Cursor expired ->
        full recompute (flagged). Either path commits via the same
        version-conditional pointer swap."""
        meta = self._meta()
        # an MV refresher is by definition a cross-process reader of the
        # base table: re-resolve the head from disk, never from this
        # instance's manifest cache (writers commit through other handles)
        head = self.base._manifest(refresh=True)["snapshot_id"]
        cur = meta["cursor"]
        if head == cur:
            return RefreshInfo(True, cur, head, meta["version"], meta["rows"])
        full = False
        try:
            changes = self.base.table_changes(cur, head)
            state = self._maintain(self.read(), changes, meta["spec"], head)
        except ValueError:
            # cursor expired by snapshot retention: the CDF window is
            # gone; rebuild from the head snapshot (Delta CDF contract)
            full = True
            state = self._definition(self.base.read(head), meta["spec"])
        new_version = meta["version"] + 1
        # each refresh writes its OWN uniquely-named state dir: a CAS
        # loser must never have touched the winner's live data — with a
        # shared v{N+1} dir, the loser's parquet overwrite lands BEFORE
        # its commit is rejected, tearing the winner's committed state.
        # The loser's orphan dir is dropped by a later _gc.
        dirname = self._new_dirname(new_version)
        rows = self._write_version(state, dirname)
        meta2 = dict(meta)
        meta2.update(
            {
                "cursor": head,
                "version": new_version,
                "rows": rows,
                "data_dir": dirname,
            }
        )
        self._commit(meta2, expect_version=meta["version"])
        self._gc(new_version, dirname)
        return RefreshInfo(False, cur, head, new_version, rows, full)

    # ---------- spec -> plans ----------

    def _definition(self, df: DataFrame, spec: dict) -> DataFrame:
        """The full (bootstrap / fallback) form of the view query."""
        if spec["kind"] == "join":
            dim = self._dim(spec)
            cond = F.col(spec["fact_col"]) == dim[spec["dim_col"]]
            how = spec.get("how", "inner")
            return df.join(dim, cond, how).select(*spec["select"])
        if spec["kind"] == "token_stats":
            # the ONE corpus-wide explode this view ever pays; every
            # refresh after this explodes only the change stream
            return (
                df.select(
                    F.explode(spec["tokens_col"]).alias(
                        spec.get("token_col", "token")
                    )
                )
                .groupBy(spec.get("token_col", "token"))
                .agg(F.count(F.lit(1)).alias(spec.get("count_col", "freq")))
            )
        g = spec["group_cols"]
        n = spec.get("count_col", "n")
        if spec["kind"] == "agg":
            aggs = [F.count(F.lit(1)).alias(n)] + [
                F.sum(c).alias(c) for c in spec["sum_cols"]
            ]
            return df.groupBy(*g).agg(*aggs)
        v = spec["val_col"]
        if spec["kind"] == "distinct_sketch":
            return (
                df.groupBy(*g)
                .agg(
                    F.count(F.lit(1)).alias(n),
                    F.hll_sketch_agg(
                        v, F.lit(spec.get("lgk", 12))
                    ).alias("sk"),
                )
                .withColumn("est", F.hll_sketch_estimate("sk"))
            )
        return df.groupBy(*g).agg(
            F.count(F.lit(1)).alias(n),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
        )

    def _dim(self, spec: dict) -> DataFrame:
        """The dimension side of a join view: a parquet dir recorded in the
        spec. Small by assumption (the one-sided-IVM contract in
        maintain_join_view); dim-side CHANGES mean re-deriving affected
        keys or a full refresh — classic one-sided IVM."""
        return self.spark.read.parquet(spec["dim_path"])

    def _maintain(
        self, view: DataFrame, changes: DataFrame, spec: dict, head: str
    ) -> DataFrame:
        from rap_etl_spark.operators import incremental as ivm

        if spec["kind"] == "token_stats":
            return ivm.maintain_token_stats(
                view,
                changes,
                tokens_col=spec["tokens_col"],
                token_col=spec.get("token_col", "token"),
                count_col=spec.get("count_col", "freq"),
            )
        if spec["kind"] == "join":
            dim = self._dim(spec)
            return ivm.maintain_join_view(
                view,
                changes,
                dim,
                key=self.base.key,
                on=F.col(spec["fact_col"]) == dim[spec["dim_col"]],
                how=spec.get("how", "inner"),
            )
        g = spec["group_cols"]
        n = spec.get("count_col", "n")
        if spec["kind"] == "agg":
            return ivm.maintain(view, changes, g, spec["sum_cols"], count_col=n)
        if spec["kind"] == "distinct_sketch":
            return ivm.maintain_distinct_sketch(
                view,
                changes,
                fact=self.base.read(head),
                group_cols=g,
                val_col=spec["val_col"],
                count_col=n,
                lgk=spec.get("lgk", 12),
            )
        return ivm.maintain_minmax(
            view,
            changes,
            # pinned to the refresh-target snapshot: a concurrent writer
            # advancing the table mid-refresh must not leak post-`head`
            # rows into the dirty-group re-aggregation
            fact=self.base.read(head),
            group_cols=g,
            val_col=spec["val_col"],
            count_col=n,
        )

    # ---------- storage plumbing ----------

    def _new_dirname(self, version: int) -> str:
        """Unique state-dir name for one refresh attempt: the version
        prefix keeps _gc's age ordering, the random suffix keeps two
        same-version refreshers (one of which must lose the CAS) from
        ever writing to the same path."""
        import uuid

        return f"v{version}-{uuid.uuid4().hex[:8]}"

    def _vdir_of(self, meta: dict) -> str:
        # data_dir absent = a view committed before unique dir names
        name = meta.get("data_dir") or f"v{meta['version']}"
        return os.path.join(self.path, "data", name)

    def _write_version(self, state: DataFrame, dirname: str) -> int:
        """Materialize one view version; aggregate states are small
        relative to the fact table (|groups|, not |rows|), so coalesce the
        shuffle tail into a handful of files. Returns the row count from
        the SAME job via observe (no second scan)."""
        from pyspark.sql import Observation

        obs = Observation(f"mv-write-{dirname}-{id(self)}")
        out = state.observe(obs, F.count(F.lit(1)).alias("rows")).coalesce(4)
        out.write.mode("overwrite").parquet(
            os.path.join(self.path, "data", dirname)
        )
        return int(obs.get["rows"] or 0)

    def _meta(self) -> dict:
        p = os.path.join(self.path, MV_FILE)
        if not self.fs.exists(p):
            raise FileNotFoundError(f"no materialized view at {self.path}")
        return json.loads(self.fs.read_text(p))

    def _commit(self, meta: dict, expect_version: int | None) -> None:
        """Atomic, version-conditional pointer swap — the only commit
        point. The read→CAS-check→swap sequence runs under the backend's
        commit lock (same discipline as the lake table's pointer swap):
        without it two refreshers can both pass the check and the loser's
        swap silently erases the winner's commit."""
        self.fs.makedirs(self.path)
        p = os.path.join(self.path, MV_FILE)
        lock_path = os.path.join(self.path, "_commit.lock")
        with self.fs.commit_lock(lock_path):
            if expect_version is not None:
                now = json.loads(self.fs.read_text(p))
                if now["version"] != expect_version:
                    raise RuntimeError(
                        f"concurrent mv refresh: expected v{expect_version}, "
                        f"found v{now['version']}"
                    )
            self.fs.write_text_atomic(p, json.dumps(meta))

    def _gc(self, head_version: int, head_dir: str) -> None:
        """Drop state dirs older than the keep window, plus SAME-version
        dirs that are not the committed head (a CAS loser's or crashed
        refresher's orphan). Never the head itself, and never a NEWER
        version — that could be a legitimate successor's in-flight write.
        Loser orphans at intermediate versions age out of the keep window
        on later refreshes."""
        data = os.path.join(self.path, "data")
        if not self.fs.exists(data):
            return
        for name in self.fs.listdir(data):
            if not name.startswith("v") or name == head_dir:
                continue
            try:
                v = int(name[1:].split("-", 1)[0])
            except ValueError:
                continue
            if v <= head_version - KEEP_VERSIONS or v == head_version:
                self.fs.rmtree(os.path.join(data, name))
