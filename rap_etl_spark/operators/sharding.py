"""Deterministic training-shard assignment: a GLOBAL token prefix sum over
a total document order, computed WITHOUT the single-partition window that
`sum() OVER (ORDER BY ...)` lowers to (the classic scale trap — one task
sees every row).

Two-phase distributed prefix sum (the textbook scan algorithm, applied to
Spark's partitioning):

1. range-partition the (order, weight) projection on the order column and
   sort within partitions — a total order across partition boundaries;
2. per-partition subtotals (map-side-combined groupBy on the partition id:
   ONE row per partition reaches the driver) → exclusive partition offsets,
   broadcast back as a tiny dict;
3. each partition computes its local cumulative sum (vectorized numpy
   inside mapInPandas, carried across Arrow batches) and adds its offset.

The ranged projection is persisted between phases 2 and 3 so both phases
see identical partition boundaries (RangePartitioner samples — without the
persist, a recompute could re-draw boundaries and mis-align the offsets).
At 100 TB the persisted projection is ~16 bytes/row — the honest cost of a
global order; everything else is one tiny collect + one narrow pass.

Shard rule: ``shard_id = floor(exclusive_prefix_sum / tokens_per_shard)``
— a document straddling a budget boundary goes to the shard its FIRST
token falls in, so every shard except the last holds ≥ tokens_per_shard
minus one document of slack. Exactly expressible in ANSI SQL
(``sum(w) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING)``), which is what the DuckDB oracle runs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_shards(
    df: DataFrame,
    tokens_per_shard: int,
    order_col: str = "doc_id",
    weight_col: str = "n_tok",
    num_partitions: int | None = None,
    keep_columns: bool = False,
) -> DataFrame:
    """(order_col, weight_col) → (order_col, weight_col, shard_id).

    order_col must be a total order (unique values); the output is then
    deterministic regardless of where the range boundaries fall.
    ``keep_columns=True`` carries the full row through the scan (for
    export: rows leave the pass already range-clustered by shard, so a
    partitioned write needs no further shuffle) — the persisted working
    set grows from 16 bytes/row to the full row width, the honest cost of
    single-pass export.
    """
    if tokens_per_shard <= 0:
        raise ValueError("tokens_per_shard must be positive")
    proj = df if keep_columns else df.select(order_col, weight_col)
    n = num_partitions or proj.sparkSession.sparkContext.defaultParallelism
    ranged = (
        proj.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # one row per partition — bounded by the partition count, not the data
    subtotals = {
        r["_pid"]: r["_w"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum(weight_col).alias("_w"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]
    shard = int(tokens_per_shard)

    from pyspark.sql import types as T

    out_schema = ranged.drop("_pid").schema.add("shard_id", T.LongType(), False)

    def local_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf["_pid"].iloc[0])]
            w = pdf[weight_col].to_numpy()
            cum = w.cumsum()
            exclusive = cum - w + run
            run += int(cum[-1])
            out = pdf.drop(columns=["_pid"]).copy()
            out["shard_id"] = exclusive // shard
            yield out

    # NOTE: `ranged` stays persisted — unpersisting before the result is
    # consumed would recompute it with freshly-sampled range boundaries and
    # mis-align the offsets. Blocks are evicted LRU / on session teardown.
    return ranged.mapInPandas(local_scan, schema=out_schema)


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Distributed ``row_number() OVER (ORDER BY order_cols)`` — the same
    two-phase prefix sum as :func:`assign_shards` with weight ≡ 1, so no
    single-partition global-window exchange ever appears in the plan.

    Returns ``(df + rank_col, total_row_count)``; the total falls out of
    the per-partition counts for free (one extra driver-side add, zero
    extra jobs). order_cols must be a total order (unique tuples).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["_pid"]: r["_c"]
        for r in ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    total = acc

    from pyspark.sql import types as T

    out_schema = ranged.drop("_pid").schema.add(rank_col, T.LongType(), False)

    def local_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"]).copy()
            out[rank_col] = np.arange(run + 1, run + 1 + len(pdf), dtype="int64")
            run += len(pdf)
            yield out

    # `ranged` stays persisted for the same boundary-stability reason as
    # in assign_shards (see NOTE above).
    return ranged.mapInPandas(local_rank, schema=out_schema), total


def shard_stats(assigned: DataFrame, weight_col: str = "n_tok") -> DataFrame:
    """Per-shard audit: document count and token total (every shard but the
    last should land within one document of the budget)."""
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight_col).alias("total_tokens"),
    )
